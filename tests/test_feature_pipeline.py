"""Feature pipeline tests: transforms produce correct static-shape packs."""

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_str
from easyrec_tpu.data.input_pipeline import InputPipeline
from easyrec_tpu.features import feature_spec as fs
from easyrec_tpu.features import transforms as tr

CONFIG = """
train_input_path: "unused"
model_dir: "/tmp/x"
data_config {
  batch_size: 4
  num_epochs: 1
  label_fields: "label"
  input_fields { input_name: "label" input_type: FLOAT }
  input_fields { input_name: "uid" input_type: STRING }
  input_fields { input_name: "age" input_type: FLOAT }
  input_fields { input_name: "price" input_type: FLOAT }
  input_fields { input_name: "tags" input_type: STRING }
  input_fields { input_name: "wtags" input_type: STRING }
  input_fields { input_name: "seq" input_type: STRING }
  input_fields { input_name: "cat" input_type: STRING }
  input_fields { input_name: "city" input_type: STRING }
  input_type: CSVInput
}
feature_config {
  features { input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 1000 }
  features { input_names: "age" feature_type: RawFeature
             embedding_dim: 8 min_val: 0.0 max_val: 100.0 }
  features { input_names: "price" feature_type: RawFeature
             boundaries: [1.0, 10.0, 100.0] embedding_dim: 8 }
  features { input_names: "tags" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 500 max_multi_len: 4 }
  features { input_names: "wtags" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 500 kv_separator: ":"
             max_multi_len: 3 }
  features { input_names: "seq" feature_type: SequenceFeature
             embedding_dim: 8 hash_bucket_size: 300 max_seq_len: 5 }
  features { input_names: "cat" input_names: "city"
             feature_name: "cat_x_city" feature_type: ComboFeature
             embedding_dim: 8 hash_bucket_size: 200 }
  features { input_names: "age" input_names: "price"
             feature_name: "age_price" feature_type: ExprFeature
             expression: "age*price" }
}
model_config { model_class: "DeepFM" }
"""


@pytest.fixture(scope='module')
def cfg():
  return get_configs_from_pipeline_str(CONFIG)


@pytest.fixture(scope='module')
def columns():
  return {
      'label': np.array([1.0, 0.0, 1.0], dtype=np.float32),
      'uid': np.array(['u1', 'u2', ''], dtype=object),
      'age': np.array([25.0, 50.0, 0.0], dtype=np.float32),
      'price': np.array([5.0, 200.0, 0.5], dtype=np.float32),
      'tags': np.array(['a|b|c', '', 'x|y|z|w|v'], dtype=object),
      'wtags': np.array(['a:0.5|b:2.0', 'c:1.5', ''], dtype=object),
      'seq': np.array(['i1|i2|i3', 'i9', ''], dtype=object),
      'cat': np.array(['men', 'women', 'men'], dtype=object),
      'city': np.array(['bj', 'sh', 'bj'], dtype=object),
  }


def _pack(cfg, columns):
  specs = fs.build_feature_specs(cfg.feature_config.features)
  transforms = tr.build_transforms(specs)
  return specs, tr.apply_transforms(transforms, columns)


def test_id_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  assert out['feat.uid.ids'].shape == (3, 1)
  assert out['feat.uid.ids'].dtype == np.int32
  assert (out['feat.uid.ids'] >= 0).all() and (out['feat.uid.ids'] < 1000).all()
  # empty string -> zero weight
  assert out['feat.uid.weights'][2, 0] == 0.0
  assert out['feat.uid.weights'][0, 0] == 1.0


def test_raw_projection_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  # min-max normalized values become embedding weights over iota ids
  assert out['feat.age.ids'].shape == (3, 1)
  assert (out['feat.age.ids'] == 0).all()
  np.testing.assert_allclose(
      out['feat.age.weights'][:, 0], [0.25, 0.5, 0.0], atol=1e-6)


def test_raw_bucketized_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  # boundaries [1, 10, 100]: 5.0->1, 200->3, 0.5->0
  assert out['feat.price.ids'][:, 0].tolist() == [1, 3, 0]
  assert specs['price'].rows == 4


def test_tag_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  ids, w = out['feat.tags.ids'], out['feat.tags.weights']
  assert ids.shape == (3, 4)
  assert w[0].tolist() == [1, 1, 1, 0]
  assert w[1].tolist() == [0, 0, 0, 0]
  assert w[2].tolist() == [1, 1, 1, 1]  # truncated to max_multi_len


def test_weighted_tag_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  w = out['feat.wtags.weights']
  np.testing.assert_allclose(w[0], [0.5, 2.0, 0.0])
  np.testing.assert_allclose(w[1], [1.5, 0.0, 0.0])
  np.testing.assert_allclose(w[2], [0.0, 0.0, 0.0])


def test_sequence_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  ids, mask = out['feat.seq.ids'], out['feat.seq.mask']
  assert ids.shape == (3, 5)
  assert mask[0].tolist() == [1, 1, 1, 0, 0]
  assert mask[1].tolist() == [1, 0, 0, 0, 0]
  assert mask[2].tolist() == [0, 0, 0, 0, 0]


def test_combo_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  ids = out['feat.cat_x_city.ids'][:, 0]
  # same (cat, city) -> same id; different -> (almost surely) different
  assert ids[0] == ids[2]
  assert ids[0] != ids[1]


def test_expr_feature(cfg, columns):
  specs, out = _pack(cfg, columns)
  np.testing.assert_allclose(
      out['feat.age_price.dense'][:, 0], [125.0, 10000.0, 0.0])


def test_csv_pipeline_end_to_end(cfg, tmp_path):
  rows = []
  for i in range(10):
    rows.append(','.join([
        str(i % 2), 'u%d' % i, str(20 + i), str(i * 3.5),
        'a|b', 'a:0.5', 'i1|i2', 'men', 'bj']))
  path = tmp_path / 'train.csv'
  path.write_text('\n'.join(rows) + '\n')
  pipe = InputPipeline(cfg.data_config, cfg.feature_config.features,
                       str(path), mode='train')
  batches = list(pipe)
  assert len(batches) == 3  # 10 rows / bs 4 -> 2 full + 1 padded
  for b in batches:
    assert b['feat.uid.ids'].shape == (4, 1)
    assert b['label.label'].shape == (4,)
  # padded tail has zero sample_weight
  assert batches[-1]['sample_weight'].sum() == 2.0
  total = sum(int(b['sample_weight'].sum()) for b in batches)
  assert total == 10


def test_csv_pipeline_sharding(cfg, tmp_path):
  rows = []
  for i in range(40):
    rows.append(','.join([
        '1', 'u%d' % i, '30', '1.0', 'a', 'a:1', 'i1', 'men', 'bj']))
  path = tmp_path / 'train.csv'
  path.write_text('\n'.join(rows) + '\n')
  seen = []
  for shard in range(2):
    pipe = InputPipeline(cfg.data_config, cfg.feature_config.features,
                         str(path), mode='eval', batch_size=8,
                         shard_index=shard, shard_num=2)
    n = sum(int(b['sample_weight'].sum()) for b in pipe)
    seen.append(n)
  assert sum(seen) == 40
  assert seen[0] == 20


def test_combo_input_seps_cross():
  """combo_input_seps: per-input splits cross-producted per row
  (reference input/input.py:378-430 sparse_cross)."""
  import numpy as np
  from easyrec_tpu.features import feature_spec as fs
  from easyrec_tpu.features import transforms as tr
  from easyrec_tpu.protos import data_pb2

  fc = data_pb2.FeatureConfig()
  fc.input_names.extend(['a', 'b'])
  fc.feature_name = 'ab'
  fc.feature_type = fc.ComboFeature
  fc.embedding_dim = 4
  fc.hash_bucket_size = 1000
  fc.combo_join_sep = '_'
  fc.combo_input_seps.extend(['|', ','])
  fc.max_multi_len = 6
  spec = fs.build_feature_spec(fc)
  assert spec.num_ids == 6
  t = tr.build_transforms({'ab': spec})[0]
  out = t({'a': np.array(['x|y', 'z', ''], dtype=object),
           'b': np.array(['1,2', '3', '4'], dtype=object)})
  ids, w = out[spec.ids_key], out[spec.weights_key]
  assert ids.shape == (3, 6)
  # row 0: x_1, x_2, y_1, y_2 -> 4 crosses
  np.testing.assert_allclose(w[0], [1, 1, 1, 1, 0, 0])
  np.testing.assert_allclose(w[1], [1, 0, 0, 0, 0, 0])
  # same cross hashes identically across rows
  from easyrec_tpu.ops import hashing
  exp = hashing.hash_strings(np.array(['x_1'], dtype=object), spec.rows)
  assert ids[0, 0] == exp[0]


def test_lookup_feature_multi_select():
  """LookupFeature: inputs [key, kv_map] (reference order), values whose
  key matches selected up to lookup_max_sel_elem_num."""
  import numpy as np
  from easyrec_tpu.features import feature_spec as fs
  from easyrec_tpu.features import transforms as tr
  from easyrec_tpu.protos import data_pb2

  fc = data_pb2.FeatureConfig()
  fc.input_names.extend(['k', 'm'])
  fc.feature_name = 'lk'
  fc.feature_type = fc.LookupFeature
  fc.embedding_dim = 4
  fc.hash_bucket_size = 100
  fc.lookup_max_sel_elem_num = 3
  spec = fs.build_feature_spec(fc)
  assert spec.kind == 'categorical' and spec.num_ids == 3
  t = tr.build_transforms({'lk': spec})[0]
  out = t({'k': np.array(['a', 'b', 'z'], dtype=object),
           'm': np.array(['a:x|b:y|a:w|a:q2|a:q3', 'b:u', 'a:v'],
                         dtype=object)})
  ids, w = out[spec.ids_key], out[spec.weights_key]
  np.testing.assert_allclose(w, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
  from easyrec_tpu.ops import hashing
  exp = hashing.hash_strings(np.array(['x', 'w'], dtype=object), spec.rows)
  assert ids[0, 0] == exp[0] and ids[0, 1] == exp[1]

  # numeric dense lookup (no id scheme): float values, padded
  fc2 = data_pb2.FeatureConfig()
  fc2.input_names.extend(['k', 'm'])
  fc2.feature_name = 'lkd'
  fc2.feature_type = fc2.LookupFeature
  fc2.lookup_max_sel_elem_num = 2
  spec2 = fs.build_feature_spec(fc2)
  assert spec2.kind == 'dense' and spec2.value_dim == 2
  t2 = tr.build_transforms({'lkd': spec2})[0]
  out2 = t2({'k': np.array(['a', 'c'], dtype=object),
             'm': np.array(['a:1.5|a:2.5|a:9', 'b:3'], dtype=object)})
  np.testing.assert_allclose(out2[spec2.dense_key], [[1.5, 2.5], [0, 0]])


def test_lookup_raw_projection_default_sel():
  """A lookup feature with embedding_dim and NO id scheme keeps the
  raw-projection behavior; the proto's default
  lookup_max_sel_elem_num=10 must NOT silently change the spec
  (code-review regression)."""
  import numpy as np
  from easyrec_tpu.features import feature_spec as fs
  from easyrec_tpu.features import transforms as tr
  from easyrec_tpu.protos import data_pb2

  fc = data_pb2.FeatureConfig()
  fc.input_names.extend(['k', 'm'])
  fc.feature_name = 'lk'
  fc.feature_type = fc.LookupFeature
  fc.embedding_dim = 8            # no hash/vocab/boundaries, sel unset
  spec = fs.build_feature_spec(fc)
  assert spec.kind == 'categorical' and spec.num_ids == 1
  assert spec.is_weighted and spec.rows == 1
  t = tr.build_transforms({'lk': spec})[0]
  out = t({'k': np.array(['a', 'b'], dtype=object),
           'm': np.array(['a:2.5|b:9', 'a:1'], dtype=object)})
  np.testing.assert_allclose(out[spec.weights_key], [[2.5], [0.0]])
  np.testing.assert_allclose(out[spec.ids_key], [[0], [0]])
