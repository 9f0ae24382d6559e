"""RTP feature-generation (fg.json) bridge.

Reference: easy_rec/python/utils/fg_util.py:16 (load_fg_json_to_config)
and utils/convert_rtp_fg.py — an RTP `fg.json` declares features by
expression ("side:column"); this converts it into easyrec_tpu
data_config input fields + feature_config entries so RTP users can reuse
their FG files directly.

Supported fg feature_types: id_feature (incl. is_multi / kv_separator
tag flavors), raw_feature (value_dimension), combo_feature,
lookup_feature, match_feature, expr_feature and sequence groups
(sequence_name + nested features).
"""

from __future__ import annotations

import json
import logging
from typing import List

from easyrec_tpu.protos import data_pb2

FeatureConfig = data_pb2.FeatureConfig
FeatureType = data_pb2.FeatureConfig.FeatureType
FieldType = data_pb2.DatasetConfig.FieldType

MAX_HASH_BUCKET = 1 << 31


def _expr_column(expression: str) -> str:
  """'user:uid' -> 'uid' (the input column name)."""
  return expression.split(':')[-1] if expression else ''


def _set_vocab(fg_feature: dict, fc: FeatureConfig) -> None:
  if 'hash_bucket_size' in fg_feature:
    fc.hash_bucket_size = min(int(fg_feature['hash_bucket_size']),
                              MAX_HASH_BUCKET)
  elif 'vocab_list' in fg_feature:
    fc.vocab_list.extend(fg_feature['vocab_list'])
  elif 'vocab_file' in fg_feature:
    fc.vocab_file = fg_feature['vocab_file']
  elif 'num_buckets' in fg_feature:
    fc.num_buckets = int(fg_feature['num_buckets'])
  elif 'boundaries' in fg_feature:
    fc.boundaries.extend(float(b) for b in fg_feature['boundaries'])
  else:
    fc.hash_bucket_size = 100000


def _convert_one(fg_feature: dict, embedding_dim: int,
                 is_sequence: bool = False,
                 sequence_prefix: str = '') -> FeatureConfig:
  fc = FeatureConfig()
  ftype = fg_feature.get('feature_type', 'id_feature')
  expr = fg_feature.get('expression', '')
  expr_col = _expr_column(expr) if isinstance(expr, str) else ''
  name = fg_feature.get('feature_name') or expr_col
  column = sequence_prefix + (expr_col or name)
  fc.input_names.append(column)
  if sequence_prefix:
    fc.feature_name = sequence_prefix + name
  elif name != column:
    fc.feature_name = name
  dim = int(fg_feature.get('embedding_dimension',
                           fg_feature.get('embedding_dim',
                                          embedding_dim)))

  if is_sequence:
    fc.feature_type = FeatureType.SequenceFeature
    fc.embedding_dim = dim
    if ftype == 'raw_feature':
      fc.sub_feature_type = FeatureType.RawFeature
      if 'boundaries' in fg_feature:
        fc.boundaries.extend(float(b) for b in fg_feature['boundaries'])
    else:
      fc.sub_feature_type = FeatureType.IdFeature
      _set_vocab(fg_feature, fc)
    return fc

  if ftype == 'id_feature':
    fc.feature_type = FeatureType.TagFeature \
        if (fg_feature.get('is_multi') or fg_feature.get('kv_separator')) \
        else FeatureType.IdFeature
    if fg_feature.get('kv_separator'):
      fc.kv_separator = fg_feature['kv_separator']
    fc.embedding_dim = dim
    _set_vocab(fg_feature, fc)
  elif ftype == 'raw_feature':
    fc.feature_type = FeatureType.RawFeature
    fc.raw_input_dim = int(fg_feature.get('value_dimension', 1))
    if 'boundaries' in fg_feature:
      fc.boundaries.extend(float(b) for b in fg_feature['boundaries'])
      fc.embedding_dim = dim
    elif fg_feature.get('embedding_dimension') or \
            fg_feature.get('embedding_dim'):
      fc.embedding_dim = dim
    if 'normalizer' in fg_feature:
      fc.normalizer_fn = fg_feature['normalizer']
  elif ftype == 'combo_feature':
    fc.feature_type = FeatureType.ComboFeature
    del fc.input_names[:]
    for expr in fg_feature.get('expression', []):
      fc.input_names.append(_expr_column(expr))
    fc.feature_name = name
    fc.embedding_dim = dim
    _set_vocab(fg_feature, fc)
  elif ftype in ('lookup_feature', 'match_feature'):
    fc.feature_type = FeatureType.LookupFeature
    del fc.input_names[:]
    # transform contract: input_names = [key, map] (reference order)
    for key in ('key', 'map', 'user', 'item', 'category'):
      if key in fg_feature:
        fc.input_names.append(_expr_column(fg_feature[key]))
    if not fc.input_names:
      fc.input_names.append(column)
    fc.feature_name = name
    if fg_feature.get('needDiscrete', True) is False or \
            'boundaries' in fg_feature:
      fc.boundaries.extend(float(b)
                           for b in fg_feature.get('boundaries', []))
    fc.embedding_dim = dim
    _set_vocab(fg_feature, fc)
  elif ftype == 'expr_feature':
    fc.feature_type = FeatureType.ExprFeature
    fc.expression = fg_feature.get('expression', '')
    del fc.input_names[:]
    for v in fg_feature.get('variables', []):
      fc.input_names.append(_expr_column(v))
    fc.feature_name = name
    if dim:
      fc.embedding_dim = dim
  else:
    raise ValueError('unsupported fg feature_type %r' % ftype)
  return fc


def convert_rtp_fg(fg: dict, embedding_dim: int = 16,
                   label_fields: List[str] = ()) -> dict:
  """fg.json dict -> {'feature_configs': [...], 'input_fields': [...],
  'label_fields': [...]}."""
  feature_configs = []
  input_fields = []
  labels = list(fg.get('label_fields', label_fields))

  def _add_input(column: str, value_type: str = 'string'):
    if any(f.input_name == column for f in input_fields):
      return
    field = data_pb2.DatasetConfig.Field()
    field.input_name = column
    field.input_type = {
        'string': FieldType.STRING, 'float': FieldType.FLOAT,
        'double': FieldType.DOUBLE, 'integer': FieldType.INT64,
        'bigint': FieldType.INT64, 'int64': FieldType.INT64,
    }.get(value_type.lower(), FieldType.STRING)
    input_fields.append(field)

  for label in labels:
    _add_input(label, 'float')

  for fg_feature in fg.get('features', []):
    if 'sequence_name' in fg_feature:
      prefix = fg_feature['sequence_name'] + '__'
      for sub in fg_feature.get('features', []):
        fc = _convert_one(sub, embedding_dim, is_sequence=True,
                          sequence_prefix=prefix)
        if 'sequence_length' in fg_feature:
          fc.max_seq_len = int(fg_feature['sequence_length'])
        if 'sequence_delim' in fg_feature:
          fc.separator = fg_feature['sequence_delim']
        feature_configs.append(fc)
        for col in fc.input_names:
          _add_input(col)
    else:
      fc = _convert_one(fg_feature, embedding_dim)
      feature_configs.append(fc)
      vt = fg_feature.get('value_type', 'string')
      for col in fc.input_names:
        _add_input(col, vt if fc.feature_type == FeatureType.RawFeature
                   else 'string')

  return {'feature_configs': feature_configs,
          'input_fields': input_fields, 'label_fields': labels}


def load_fg_json_to_config(pipeline_config) -> None:
  """Populate data/feature configs from pipeline_config.fg_json_path
  (reference fg_util.py:16)."""
  path = pipeline_config.fg_json_path
  if not path:
    return
  with open(path) as f:
    fg = json.load(f)
  converted = convert_rtp_fg(fg, label_fields=list(
      pipeline_config.data_config.label_fields))
  dc = pipeline_config.data_config
  if not dc.input_fields:
    dc.input_fields.extend(converted['input_fields'])
  if not dc.label_fields:
    dc.label_fields.extend(converted['label_fields'])
  fc = pipeline_config.feature_config
  if not fc.features:
    fc.features.extend(converted['feature_configs'])
  logging.info('loaded %d features from fg json %s',
               len(converted['feature_configs']), path)
