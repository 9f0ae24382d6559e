"""Feature specs: the static contract between the host feature pipeline
and the device-side embedding engine.

Every feature is packed into STATIC shapes (XLA requires them):
  categorical -> ids[B, K] int32 + weights[B, K] f32   (K = packing width)
  dense       -> dense[B, D] f32
  sequence    -> ids[B, L] int32 + mask[B, L] f32       (L = max_seq_len)

This replaces the reference's SparseTensor/feature-column stack
(easy_rec/python/feature_column/feature_column.py:41-664 and the forked
compat/feature_column): a RawFeature with embedding becomes a weighted-id
lookup (ids=iota, weights=values — the reference's raw-projection trick,
feature_column.py:351), a TagFeature becomes fixed-width padded ids with
zero weights for padding, and combiners become masked reductions on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from easyrec_tpu.protos import data_pb2

FeatureConfig = data_pb2.FeatureConfig
FeatureType = data_pb2.FeatureConfig.FeatureType

# default packing width for multi-value (tag) features
DEFAULT_MAX_TAG_LEN = 16
DEFAULT_MAX_SEQ_LEN = 50


@dataclasses.dataclass
class FeatureSpec:
  """Static description of one transformed feature."""
  name: str                      # output name (feature_name or input_names[0])
  kind: str                      # categorical | dense | sequence
  # categorical / sequence:
  num_ids: int = 1               # K (packing width) or L (max_seq_len)
  table_name: str = ''           # embedding table identity (shared tables
                                 # share this name)
  rows: int = 0                  # vocab rows of the table
  embedding_dim: int = 0
  combiner: str = 'sum'
  # dense:
  value_dim: int = 1             # D
  # raw-as-embedding features multiply by value weights
  is_weighted: bool = False
  # sequence sub-type is dense (raw values instead of ids)
  seq_is_dense: bool = False
  # original proto config
  config: Optional[FeatureConfig] = None

  @property
  def ids_key(self) -> str:
    return 'feat.%s.ids' % self.name

  @property
  def weights_key(self) -> str:
    return 'feat.%s.weights' % self.name

  @property
  def dense_key(self) -> str:
    return 'feat.%s.dense' % self.name

  @property
  def mask_key(self) -> str:
    return 'feat.%s.mask' % self.name


def feature_output_name(config: FeatureConfig) -> str:
  if config.feature_name:
    return config.feature_name
  return config.input_names[0]


def table_rows(config: FeatureConfig) -> int:
  """Vocab rows needed by a feature's embedding table."""
  if config.hash_bucket_size > 0:
    return int(config.hash_bucket_size)
  if config.num_buckets > 0:
    return int(config.num_buckets)
  if config.vocab_list:
    return len(config.vocab_list) + 1          # +1 OOV bucket at the end
  if config.vocab_file:
    with open(config.vocab_file) as f:
      n = sum(1 for line in f if line.strip())
    return n + 1
  if list(config.boundaries):
    return len(config.boundaries) + 1
  if config.feature_type == FeatureType.RawFeature or (
      config.feature_type == FeatureType.ExprFeature):
    # raw-projection: one row per raw dimension
    return max(int(config.raw_input_dim), 1)
  if config.feature_type == FeatureType.LookupFeature:
    return max(int(config.raw_input_dim), 1)
  raise ValueError(
      'feature %s needs hash_bucket_size/num_buckets/vocab/boundaries' %
      feature_output_name(config))


def build_feature_spec(config: FeatureConfig,
                       max_tag_len: int = DEFAULT_MAX_TAG_LEN) -> FeatureSpec:
  """Build the static spec for one feature config."""
  name = feature_output_name(config)
  ftype = config.feature_type
  table_name = config.embedding_name or name
  emb_dim = int(config.embedding_dim)
  combiner = config.combiner or 'sum'
  multi_len = int(config.max_multi_len) or max_tag_len

  if ftype == FeatureType.IdFeature:
    return FeatureSpec(
        name=name, kind='categorical', num_ids=1,
        table_name=table_name, rows=table_rows(config),
        embedding_dim=emb_dim, combiner=combiner, config=config)

  if ftype == FeatureType.TagFeature:
    return FeatureSpec(
        name=name, kind='categorical', num_ids=multi_len,
        table_name=table_name, rows=table_rows(config),
        embedding_dim=emb_dim, combiner=combiner,
        is_weighted=bool(config.kv_separator) or len(config.input_names) > 1,
        config=config)

  # lookup_max_sel_elem_num defaults to 10 in the proto: only an
  # EXPLICIT setting opts into multi-selection
  explicit_sel = (ftype == FeatureType.LookupFeature and
                  config.HasField('lookup_max_sel_elem_num'))
  if ftype == FeatureType.LookupFeature and (
      config.hash_bucket_size > 0 or config.num_buckets > 0 or
      config.vocab_list or config.vocab_file or explicit_sel):
    # kv-map lookup with an id scheme or multi-selection (reference
    # input/input.py:941 _lookup_preprocess, lookup_max_sel_elem_num)
    n_sel = max(int(config.lookup_max_sel_elem_num), 1) \
        if explicit_sel else 1
    if (config.hash_bucket_size > 0 or config.num_buckets > 0 or
        config.vocab_list or config.vocab_file or
        list(config.boundaries)):
      return FeatureSpec(
          name=name, kind='categorical', num_ids=n_sel,
          table_name=table_name, rows=table_rows(config),
          embedding_dim=emb_dim, combiner=combiner, config=config)
    if emb_dim > 0:
      # raw-projection numeric lookup: iota ids weighted by values
      return FeatureSpec(
          name=name, kind='categorical', num_ids=n_sel,
          table_name=table_name, rows=n_sel, is_weighted=True,
          embedding_dim=emb_dim, combiner=combiner, config=config)
    return FeatureSpec(name=name, kind='dense', value_dim=n_sel,
                       config=config)

  if ftype in (FeatureType.RawFeature, FeatureType.ExprFeature,
               FeatureType.LookupFeature):
    raw_dim = max(int(config.raw_input_dim), 1)
    if list(config.boundaries):
      # bucketized: one id per raw dimension
      return FeatureSpec(
          name=name, kind='categorical', num_ids=raw_dim,
          table_name=table_name, rows=table_rows(config),
          embedding_dim=emb_dim, combiner=combiner, config=config)
    if emb_dim > 0:
      # raw-projection: ids = iota(raw_dim), weights = values
      return FeatureSpec(
          name=name, kind='categorical', num_ids=raw_dim,
          table_name=table_name, rows=raw_dim,
          embedding_dim=emb_dim, combiner='sum', is_weighted=True,
          config=config)
    return FeatureSpec(name=name, kind='dense', value_dim=raw_dim,
                       config=config)

  if ftype == FeatureType.ComboFeature:
    # combo_input_seps: multi-valued inputs cross-producted per row
    # (reference input/input.py:378-430 sparse_cross) — static cap on
    # crosses via max_multi_len (default 8)
    n_ids = 1
    if list(config.combo_input_seps):
      n_ids = int(config.max_multi_len) or 8
    return FeatureSpec(
        name=name, kind='categorical', num_ids=n_ids,
        table_name=table_name, rows=table_rows(config),
        embedding_dim=emb_dim, combiner=combiner, config=config)

  if ftype == FeatureType.SequenceFeature:
    seq_len = int(config.max_seq_len) or DEFAULT_MAX_SEQ_LEN
    sub = config.sub_feature_type
    if sub == FeatureType.RawFeature and not list(config.boundaries):
      # numeric sequence: each position is raw_input_dim floats split by
      # seq_multi_sep (reference input/input.py:677-747 raw seq parse)
      return FeatureSpec(
          name=name, kind='sequence', num_ids=seq_len, seq_is_dense=True,
          value_dim=max(int(config.raw_input_dim), 1),
          embedding_dim=emb_dim, config=config)
    return FeatureSpec(
        name=name, kind='sequence', num_ids=seq_len,
        table_name=table_name, rows=table_rows(config),
        embedding_dim=emb_dim, combiner=combiner, config=config)

  if ftype == FeatureType.PassThroughFeature:
    return FeatureSpec(name=name, kind='dense',
                       value_dim=max(int(config.raw_input_dim), 1),
                       config=config)

  raise ValueError('unsupported feature type %s for %s' % (ftype, name))


def build_feature_specs(configs,
                        max_tag_len: int = DEFAULT_MAX_TAG_LEN
                        ) -> Dict[str, FeatureSpec]:
  """Build specs for all features; validates shared-embedding consistency."""
  specs: Dict[str, FeatureSpec] = {}
  table_shape: Dict[str, tuple] = {}
  for config in configs:
    spec = build_feature_spec(config, max_tag_len=max_tag_len)
    if spec.name in specs:
      raise ValueError('duplicate feature name %s' % spec.name)
    specs[spec.name] = spec
    if spec.kind in ('categorical', 'sequence') and not spec.seq_is_dense:
      shape = (spec.rows, spec.embedding_dim)
      prev = table_shape.get(spec.table_name)
      if prev is not None and prev != shape:
        raise ValueError(
            'shared embedding %s has inconsistent shapes %s vs %s' %
            (spec.table_name, prev, shape))
      table_shape[spec.table_name] = shape
  return specs
