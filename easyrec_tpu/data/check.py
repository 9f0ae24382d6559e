"""In-pipeline check-mode validators: per-batch data checks with
feature-name-pointed errors, toggled by the --check_mode CLI flag.

Without check_mode, a malformed kv pair or wrong-arity raw column fails
deep inside a vectorized transform with a bare numpy error; these
validators run on the RAW columns before the transforms and raise a
ValueError naming the feature, the row, and the offending value.

Reference behavior contract: easy_rec/python/utils/check_utils.py
(check_split / check_string_to_number) wired as per-batch py_func
validators at input/input.py:454-456 and friends.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from easyrec_tpu.protos import data_pb2

FeatureType = data_pb2.FeatureConfig.FeatureType


class CheckError(ValueError):
  """Data-validation failure with a pointed message."""


def _to_str_array(col) -> np.ndarray:
  arr = np.asarray(col)
  if arr.dtype.kind in ('U', 'S', 'O'):
    return arr.astype(str)
  return arr.astype(str)


def _check_numeric(vals: np.ndarray, field: str, what: str = 'value'):
  """Every non-empty string parses as a float (reference
  check_string_to_number)."""
  for i, v in enumerate(vals):
    s = str(v).strip()
    if not s:
      continue
    try:
      float(s)
    except ValueError:
      raise CheckError(
          'check_mode: field %r row %d: cannot convert %s %r to a number '
          '— check the data and separators' % (field, i, what, s))


def _check_split_arity(vals: np.ndarray, sep: str, required: int,
                       field: str):
  """Every row splits into exactly `required` parts (reference
  check_split)."""
  for i, v in enumerate(vals):
    s = str(v)
    n = len(s.split(sep)) if s else 0
    if n != required:
      raise CheckError(
          'check_mode: field %r row %d: separator %r gives %d parts, '
          'expected %d — value %r' % (field, i, sep, n, required, s))


def validate_columns(specs: Dict[str, object],
                     columns: Dict[str, np.ndarray],
                     label_fields: List[str] = (),
                     sample_weight_field: str = None) -> None:
  """Validate one raw chunk against the feature specs. Raises CheckError
  pointing at the first offending (feature, row, value)."""
  for label in label_fields:
    if label in columns:
      _check_numeric(_to_str_array(columns[label]), label, 'label')
  if sample_weight_field and sample_weight_field in columns:
    _check_numeric(_to_str_array(columns[sample_weight_field]),
                   sample_weight_field, 'sample_weight')

  for spec in specs.values():
    cfg = getattr(spec, 'config', None)
    if cfg is None:
      continue
    for input_name in cfg.input_names:
      if input_name not in columns:
        continue
      vals = _to_str_array(columns[input_name])
      ftype = cfg.feature_type
      sep = cfg.separator or '|'
      if ftype == FeatureType.RawFeature and not cfg.seq_multi_sep:
        dim = int(cfg.raw_input_dim) or 1
        if dim > 1:
          _check_split_arity(vals, sep, dim, input_name)
          for i, v in enumerate(vals):
            for part in str(v).split(sep):
              p = part.strip()
              if p:
                try:
                  float(p)
                except ValueError:
                  raise CheckError(
                      'check_mode: field %r row %d: element %r of the '
                      '%d-dim raw vector is not numeric' %
                      (input_name, i, p, dim))
        else:
          _check_numeric(vals, input_name)
      elif ftype == FeatureType.TagFeature and cfg.kv_separator:
        kv = cfg.kv_separator
        for i, v in enumerate(vals):
          s = str(v)
          if not s:
            continue
          for item in s.split(sep):
            if not item:
              continue
            parts = item.split(kv)
            if len(parts) != 2:
              raise CheckError(
                  'check_mode: field %r row %d: kv item %r does not '
                  'split into key%svalue exactly once' %
                  (input_name, i, item, kv))
            try:
              float(parts[1])
            except ValueError:
              raise CheckError(
                  'check_mode: field %r row %d: kv weight %r of item %r '
                  'is not numeric' % (input_name, i, parts[1], item))
      elif ftype == FeatureType.SequenceFeature and \
          cfg.sub_feature_type == FeatureType.RawFeature:
        # numeric sequences: every position's sub-values are numeric and
        # have consistent arity (seq_multi_sep splits positions)
        psep = cfg.seq_multi_sep or ';'
        dim = int(cfg.raw_input_dim) or 1
        for i, v in enumerate(vals):
          s = str(v)
          if not s:
            continue
          for pos in s.split(psep):
            if not pos:
              continue
            parts = [p for p in pos.split(sep)]
            if dim > 1 and len(parts) != dim:
              raise CheckError(
                  'check_mode: field %r row %d: sequence position %r has '
                  '%d sub-values, expected raw_input_dim=%d' %
                  (input_name, i, pos, len(parts), dim))
            for p in parts:
              if p.strip():
                try:
                  float(p)
                except ValueError:
                  raise CheckError(
                      'check_mode: field %r row %d: sequence value %r is '
                      'not numeric' % (input_name, i, p))
      elif ftype == FeatureType.LookupFeature:
        # map side ('[key, map]' order): items must be key<kv>value
        kv = cfg.kv_separator or ':'
        if input_name != cfg.input_names[0]:
          continue
        for i, v in enumerate(vals):
          s = str(v)
          if not s:
            continue
          for item in s.split(sep):
            if item and len(item.split(kv)) != 2:
              raise CheckError(
                  'check_mode: field %r row %d: lookup map item %r does '
                  'not split into key%svalue exactly once' %
                  (input_name, i, item, kv))
