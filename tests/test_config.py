"""Config-system tests: text-format parse of reference-style configs,
dotted-path editor, shared-feature expansion, round-trip save."""

import os

import pytest

from easyrec_tpu.config import (
    edit_config,
    get_configs_from_pipeline_file,
    get_configs_from_pipeline_str,
    get_feature_configs,
    save_pipeline_config,
)

REF_CONFIG_DIR = '/root/reference/examples/configs'

MINI_CONFIG = """
train_input_path: "train.csv"
eval_input_path: "eval.csv"
model_dir: "/tmp/ckpt"
train_config {
  optimizer_config {
    adam_optimizer {
      learning_rate {
        constant_learning_rate { learning_rate: 0.001 }
      }
    }
  }
  num_steps: 100
}
eval_config { metrics_set { auc {} } }
data_config {
  batch_size: 8
  label_fields: "label"
  input_fields { input_name: "label" input_type: FLOAT }
  input_fields { input_name: "uid" input_type: STRING }
  input_fields { input_name: "iid" input_type: STRING }
  input_type: CSVInput
}
feature_config {
  features {
    input_names: "uid" feature_type: IdFeature
    embedding_dim: 8 hash_bucket_size: 100
  }
  features {
    input_names: "iid" feature_type: IdFeature
    embedding_dim: 8 hash_bucket_size: 100
  }
}
model_config {
  model_class: "DeepFM"
  feature_groups {
    group_name: "deep" feature_names: "uid" feature_names: "iid"
    wide_deep: DEEP
  }
  deepfm { dnn { hidden_units: [16, 8] } }
}
"""


def test_parse_mini_config():
  cfg = get_configs_from_pipeline_str(MINI_CONFIG)
  assert cfg.model_config.model_class == 'DeepFM'
  assert cfg.data_config.batch_size == 8
  assert list(cfg.model_config.deepfm.dnn.hidden_units) == [16, 8]
  assert cfg.train_config.optimizer_config[0].WhichOneof(
      'optimizer') == 'adam_optimizer'


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason='reference not mounted')
def test_parse_reference_deepfm_criteo():
  cfg = get_configs_from_pipeline_file(
      os.path.join(REF_CONFIG_DIR, 'deepfm_on_criteo.config'))
  assert cfg.model_config.model_class == 'DeepFM'
  assert len(get_feature_configs(cfg)) == 39
  groups = {g.group_name for g in cfg.model_config.feature_groups}
  assert groups == {'deep', 'wide'}
  lr = cfg.train_config.optimizer_config[0].adam_optimizer.learning_rate
  assert lr.WhichOneof('learning_rate') == 'exponential_decay_learning_rate'
  assert lr.exponential_decay_learning_rate.initial_learning_rate == \
      pytest.approx(0.001)


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason='reference not mounted')
def test_parse_all_reference_example_configs():
  import glob
  paths = sorted(glob.glob(os.path.join(REF_CONFIG_DIR, '*.config')))
  assert paths
  for p in paths:
    cfg = get_configs_from_pipeline_file(p)
    assert cfg.model_config.model_class


def test_edit_config_scalar_and_nested():
  cfg = get_configs_from_pipeline_str(MINI_CONFIG)
  edit_config(cfg, {'train_config.num_steps': '500'})
  assert cfg.train_config.num_steps == 500
  edit_config(cfg, {'data_config.batch_size': 64})
  assert cfg.data_config.batch_size == 64


def test_edit_config_array_selectors():
  cfg = get_configs_from_pipeline_str(MINI_CONFIG)
  edit_config(cfg, {'feature_config.features[0].embedding_dim': 32})
  assert cfg.feature_config.features[0].embedding_dim == 32
  assert cfg.feature_config.features[1].embedding_dim == 8
  edit_config(cfg, {'feature_config.features[0:2].combiner': 'mean'})
  assert all(f.combiner == 'mean' for f in cfg.feature_config.features)
  edit_config(
      cfg, {'feature_config.features[input_names[0]=iid].embedding_dim': 16})
  assert cfg.feature_config.features[1].embedding_dim == 16
  assert cfg.feature_config.features[0].embedding_dim == 32
  edit_config(
      cfg, {'feature_config.features[embedding_dim>=32].hash_bucket_size': 7})
  assert cfg.feature_config.features[0].hash_bucket_size == 7
  assert cfg.feature_config.features[1].hash_bucket_size == 100


def test_edit_config_repeated_field():
  cfg = get_configs_from_pipeline_str(MINI_CONFIG)
  edit_config(cfg, {'model_config.deepfm.dnn.hidden_units': '[32,16,8]'})
  assert list(cfg.model_config.deepfm.dnn.hidden_units) == [32, 16, 8]


def test_shared_names_expansion():
  text = MINI_CONFIG.replace(
      'input_names: "uid" feature_type: IdFeature',
      'input_names: "uid" feature_type: IdFeature shared_names: "uid2"')
  cfg = get_configs_from_pipeline_str(text)
  features = {f.input_names[0]: f for f in cfg.feature_config.features}
  assert 'uid2' in features
  assert features['uid2'].embedding_name == features['uid'].embedding_name
  assert features['uid2'].embedding_name != ''


def test_save_round_trip(tmp_path):
  cfg = get_configs_from_pipeline_str(MINI_CONFIG)
  path = save_pipeline_config(cfg, str(tmp_path))
  cfg2 = get_configs_from_pipeline_file(path)
  assert cfg2 == cfg


def test_auto_expand_input_fields():
  text = MINI_CONFIG.replace(
      'data_config {\n  batch_size: 8',
      'data_config {\n  auto_expand_input_fields: true\n  batch_size: 8'
  ).replace('input_fields { input_name: "uid" input_type: STRING }',
            'input_fields { input_name: "f[1-3]" input_type: STRING }')
  cfg = get_configs_from_pipeline_str(text)
  names = [f.input_name for f in cfg.data_config.input_fields]
  assert names == ['label', 'f1', 'f2', 'f3', 'iid']


def test_auto_expand_group_feature_names():
  """feature_groups expand name[lo-hi] ranges unconditionally
  (reference feature_column/feature_group.py:51)."""
  text = MINI_CONFIG.replace('feature_names: "uid"',
                             'feature_names: "f[1-3]"')
  cfg = get_configs_from_pipeline_str(text)
  g = cfg.model_config.feature_groups[0]
  assert list(g.feature_names)[:3] == ['f1', 'f2', 'f3']
