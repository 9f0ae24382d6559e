"""RTP fg.json bridge: feature/data config generation + end-to-end train."""

import json
import os

import numpy as np

from easyrec_tpu.protos import data_pb2

FeatureType = data_pb2.FeatureConfig.FeatureType

FG = {
    'label_fields': ['label'],
    'features': [
        {'feature_type': 'id_feature', 'expression': 'user:uid',
         'hash_bucket_size': 100, 'embedding_dimension': 8},
        {'feature_type': 'id_feature', 'expression': 'item:cate',
         'feature_name': 'item_cate', 'vocab_list': ['a', 'b', 'c'],
         'embedding_dimension': 8},
        {'feature_type': 'id_feature', 'expression': 'user:tags',
         'is_multi': True, 'hash_bucket_size': 50,
         'embedding_dimension': 8},
        {'feature_type': 'raw_feature', 'expression': 'user:age',
         'value_type': 'float'},
        {'feature_type': 'raw_feature', 'expression': 'item:price',
         'boundaries': [1.0, 5.0, 10.0], 'embedding_dimension': 8},
        {'feature_type': 'combo_feature',
         'feature_name': 'uid_x_cate',
         'expression': ['user:uid', 'item:cate'],
         'hash_bucket_size': 200, 'embedding_dimension': 8},
        {'sequence_name': 'click_seq', 'sequence_length': 5,
         'features': [
             {'feature_type': 'id_feature', 'expression': 'item:cate',
              'hash_bucket_size': 40, 'embedding_dimension': 8},
         ]},
    ],
}


def test_convert_rtp_fg():
  from easyrec_tpu.utils.fg_util import convert_rtp_fg
  out = convert_rtp_fg(FG)
  by_name = {fc.feature_name or fc.input_names[0]: fc
             for fc in out['feature_configs']}
  assert by_name['uid'].feature_type == FeatureType.IdFeature
  assert by_name['uid'].hash_bucket_size == 100
  assert by_name['item_cate'].vocab_list == ['a', 'b', 'c']
  assert by_name['tags'].feature_type == FeatureType.TagFeature
  assert by_name['age'].feature_type == FeatureType.RawFeature
  assert by_name['age'].embedding_dim == 0       # pure dense
  assert list(by_name['price'].boundaries) == [1.0, 5.0, 10.0]
  assert by_name['uid_x_cate'].feature_type == FeatureType.ComboFeature
  assert list(by_name['uid_x_cate'].input_names) == ['uid', 'cate']
  seq = by_name['click_seq__cate']
  assert seq.feature_type == FeatureType.SequenceFeature
  assert seq.max_seq_len == 5
  inputs = {f.input_name for f in out['input_fields']}
  assert {'label', 'uid', 'cate', 'tags', 'age', 'price',
          'click_seq__cate'} <= inputs
  assert out['label_fields'] == ['label']


def test_fg_json_end_to_end(tmp_path):
  """A pipeline config with ONLY fg_json_path trains end to end."""
  from easyrec_tpu import main as driver
  fg_path = os.path.join(str(tmp_path), 'fg.json')
  simple_fg = {
      'label_fields': ['label'],
      'features': [
          {'feature_type': 'id_feature', 'expression': 'user:c1',
           'hash_bucket_size': 100, 'embedding_dimension': 8},
          {'feature_type': 'id_feature', 'expression': 'item:c2',
           'hash_bucket_size': 100, 'embedding_dimension': 8},
          {'feature_type': 'raw_feature', 'expression': 'user:d1',
           'value_type': 'float', 'embedding_dimension': 8},
      ],
  }
  with open(fg_path, 'w') as f:
    json.dump(simple_fg, f)

  rng = np.random.default_rng(0)
  train = os.path.join(str(tmp_path), 'train.csv')
  with open(train, 'w') as f:
    for _ in range(2048):
      c1 = rng.integers(0, 20)
      c2 = rng.integers(0, 10)
      d1 = rng.random()
      p = 1 / (1 + np.exp(-(0.8 * (c1 % 5) - 1.0 * (c2 % 3) + 2 * d1
                            - 1.5)))
      f.write('%d,u%d,v%d,%.4f\n' % (rng.random() < p, c1, c2, d1))

  cfg_text = """
train_input_path: "%s"
eval_input_path: "%s"
model_dir: "%s"
fg_json_path: "%s"
train_config {
  optimizer_config { adam_optimizer {
    learning_rate { constant_learning_rate { learning_rate: 0.01 } } } }
  num_steps: 60
}
eval_config { metrics_set { auc {} } }
data_config {
  batch_size: 128
  input_type: CSVInput
}
model_config {
  model_class: "DeepFM"
  feature_groups {
    group_name: "deep"
    feature_names: "c1" feature_names: "c2" feature_names: "d1"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "wide"
    feature_names: "c1" feature_names: "c2"
    wide_deep: WIDE
  }
  deepfm { dnn { hidden_units: [16] use_bn: false } }
}
""" % (train, train, os.path.join(str(tmp_path), 'ckpt'), fg_path)
  cfg_path = os.path.join(str(tmp_path), 'pipeline.config')
  with open(cfg_path, 'w') as f:
    f.write(cfg_text)
  result = driver.train_and_evaluate(cfg_path)
  assert result['eval_metrics']['auc'] > 0.7
