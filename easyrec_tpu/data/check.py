"""In-pipeline check-mode validators: per-batch data checks with
feature-name-pointed errors, toggled by the --check_mode CLI flag.

Without check_mode, a malformed kv pair or wrong-arity raw column fails
deep inside a vectorized transform with a bare numpy error; these
validators run on the RAW columns before the transforms and raise a
ValueError naming the feature, the row, and the offending value.

The common case (clean batch) is fully vectorized — one bulk numpy
parse per column, no per-row Python. Only when the bulk check fails do
we re-scan the column row by row to produce the pointed error, so the
error messages are identical to the original per-row validators while a
clean 4096-row batch costs microseconds instead of milliseconds.

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


def _bulk_parse_ok(strings: np.ndarray, empty_ok: bool = True) -> bool:
  """One vectorized float-parse over the whole column. empty_ok fills
  blank (all-whitespace) entries with '0' first — matching validators
  that skip empties. numpy's parser is at least as strict as float(),
  so True here means every row passes the per-row check."""
  if strings.size == 0:
    return True
  if empty_ok:
    s = np.char.strip(strings)
    strings = np.where(s == '', '0', s)
  try:
    strings.astype(np.float64)
    return True
  except ValueError:
    return False


def _explode(vals: np.ndarray, sep: str) -> np.ndarray:
  """All sep-separated parts of all rows as one flat array (rows are
  joined with sep first, so boundaries split correctly)."""
  if vals.size == 0:
    return vals
  return np.asarray(sep.join(vals.tolist()).split(sep))


def _check_numeric(vals: np.ndarray, field: str, what: str = 'value'):
  """Every non-empty string parses as a float (reference
  check_string_to_number)."""
  if _bulk_parse_ok(vals, empty_ok=True):
    return
  # slow path only to point at the offending row
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
  counts = np.where(vals != '', np.char.count(vals, sep) + 1, 0)
  bad = np.nonzero(counts != required)[0]
  if bad.size:
    i = int(bad[0])
    s = str(vals[i])
    n = len(s.split(sep)) if s else 0
    raise CheckError(
        'check_mode: field %r row %d: separator %r gives %d parts, '
        'expected %d — value %r' % (field, i, sep, n, required, s))


def _check_raw_vector(vals: np.ndarray, sep: str, dim: int,
                      input_name: str):
  _check_split_arity(vals, sep, dim, input_name)
  if _bulk_parse_ok(_explode(vals, sep), empty_ok=True):
    return
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


def _check_kv_tags(vals: np.ndarray, sep: str, kv: str, input_name: str):
  items = _explode(vals[vals != ''], sep)
  items = items[items != '']
  if items.size:
    if (np.char.count(items, kv) == 1).all():
      weights = np.char.partition(items, kv)[:, 2]
      # blank weight must FAIL (float('') raises in the row check)
      if _bulk_parse_ok(weights, empty_ok=False):
        return
  else:
    return
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


def _check_seq_raw(vals: np.ndarray, sep: str, psep: str, dim: int,
                   input_name: str):
  positions = _explode(vals[vals != ''], psep)
  positions = positions[positions != '']
  ok = True
  if positions.size:
    if dim > 1:
      ok = bool((np.char.count(positions, sep) + 1 == dim).all())
    if ok:
      ok = _bulk_parse_ok(_explode(positions, sep), empty_ok=True)
  if ok:
    return
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


def _check_lookup_map(vals: np.ndarray, sep: str, kv: str,
                      input_name: str):
  items = _explode(vals[vals != ''], sep)
  items = items[items != '']
  if items.size == 0 or (np.char.count(items, kv) == 1).all():
    return
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
          _check_raw_vector(vals, sep, dim, input_name)
        else:
          _check_numeric(vals, input_name)
      elif ftype == FeatureType.TagFeature and cfg.kv_separator:
        _check_kv_tags(vals, sep, cfg.kv_separator, input_name)
      elif ftype == FeatureType.SequenceFeature and \
          cfg.sub_feature_type == FeatureType.RawFeature:
        # numeric sequences: every position's sub-values are numeric and
        # have consistent arity (seq_multi_sep splits positions)
        _check_seq_raw(vals, sep, cfg.seq_multi_sep or ';',
                       int(cfg.raw_input_dim) or 1, input_name)
      elif ftype == FeatureType.LookupFeature:
        # map side ('[key, map]' order): items must be key<kv>value
        if input_name != cfg.input_names[0]:
          continue
        _check_lookup_map(vals, sep, cfg.kv_separator or ':',
                          input_name)
