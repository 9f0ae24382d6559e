"""Extra model families: RocketLaunching, CMBF, Uniter, PDN,
CoMetricLearningI2I — build, train finite, loss decreases on a repeated
batch."""

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_str
from easyrec_tpu.train.trainer import Trainer
from easyrec_tpu.utils.synthetic import synthetic_batch

DATA_SECTION = """
train_input_path: "synthetic"
eval_input_path: "synthetic"
model_dir: "/tmp/zoo_extra_test"
train_config {
  optimizer_config {
    adam_optimizer {
      learning_rate { constant_learning_rate { learning_rate: 0.01 } }
    }
  }
  num_steps: 5
}
eval_config { metrics_set { auc {} } }
data_config {
  batch_size: 32
  label_fields: "clk"
  input_fields { input_name: "clk" input_type: FLOAT }
  input_fields { input_name: "uid" input_type: STRING }
  input_fields { input_name: "iid" input_type: STRING }
  input_fields { input_name: "cate" input_type: STRING }
  input_fields { input_name: "title" input_type: STRING }
  input_fields { input_name: "img_vec" input_type: STRING }
  input_fields { input_name: "age" input_type: FLOAT }
  input_fields { input_name: "seq_cate" input_type: STRING }
  input_type: DummyInput
}
feature_config {
  features { input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 100
             initializer { random_normal_initializer { stddev: 0.35 } } }
  features { input_names: "iid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 100
             initializer { random_normal_initializer { stddev: 0.35 } } }
  features { input_names: "cate" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 40
             initializer { random_normal_initializer { stddev: 0.35 } } }
  features { input_names: "title" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 60 max_multi_len: 4
             initializer { random_normal_initializer { stddev: 0.35 } } }
  features { input_names: "img_vec" feature_type: RawFeature
             raw_input_dim: 16 separator: "|"
             initializer { random_normal_initializer { stddev: 0.35 } } }
  features { input_names: "age" feature_type: RawFeature
             embedding_dim: 8
             initializer { random_normal_initializer { stddev: 0.35 } } }
  features { input_names: "seq_cate" feature_type: SequenceFeature
             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6
             initializer { random_normal_initializer { stddev: 0.35 } } }
}
"""

MODEL_CONFIGS = {
    'RocketLaunching': """
  feature_groups {
    group_name: "all"
    feature_names: "uid" feature_names: "iid" feature_names: "cate"
    feature_names: "age"
    wide_deep: DEEP
  }
  rocket_launching {
    share_dnn { hidden_units: [16] use_bn: false }
    booster_dnn { hidden_units: [16, 8] }
    light_dnn { hidden_units: [16, 8] }
    feature_based_distillation: true
  }
""",
    'CMBF': """
  feature_groups {
    group_name: "image" feature_names: "img_vec" wide_deep: DEEP
  }
  feature_groups {
    group_name: "text"
    feature_names: "cate" feature_names: "title" wide_deep: DEEP
  }
  feature_groups {
    group_name: "other"
    feature_names: "uid" feature_names: "age" wide_deep: DEEP
  }
  cmbf {
    config {
      multi_head_num: 2
      image_multi_head_num: 2
      text_multi_head_num: 2
      text_head_size: 8
      image_head_size: 8
      image_feature_patch_num: 4
      image_self_attention_layer_num: 1
      text_self_attention_layer_num: 1
      cross_modal_layer_num: 1
      other_feature_dnn { hidden_units: [8] use_bn: false }
    }
    final_dnn { hidden_units: [16] use_bn: false }
  }
""",
    'Uniter': """
  feature_groups {
    group_name: "image" feature_names: "img_vec" wide_deep: DEEP
  }
  feature_groups {
    group_name: "text"
    feature_names: "cate" feature_names: "title" wide_deep: DEEP
  }
  feature_groups {
    group_name: "other"
    feature_names: "uid" feature_names: "age" wide_deep: DEEP
  }
  uniter {
    config {
      hidden_size: 16
      num_hidden_layers: 2
      num_attention_heads: 2
      intermediate_size: 32
      other_feature_dnn { hidden_units: [8] use_bn: false }
    }
    final_dnn { hidden_units: [16] use_bn: false }
  }
""",
    'PDN': """
  feature_groups {
    group_name: "user"
    feature_names: "uid" feature_names: "age" wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate" wide_deep: DEEP
  }
  feature_groups {
    group_name: "hist" feature_names: "seq_cate" wide_deep: DEEP
  }
  pdn {
    user_dnn { hidden_units: [16, 8] use_bn: false }
    item_dnn { hidden_units: [16, 8] use_bn: false }
    u2i_dnn { hidden_units: [8] use_bn: false }
    trigger_dnn { hidden_units: [8, 1] use_bn: false }
    i2i_dnn { hidden_units: [8] use_bn: false }
    sim_dnn { hidden_units: [8, 1] use_bn: false }
    direct_user_dnn { hidden_units: [8] use_bn: false }
    direct_item_dnn { hidden_units: [8] use_bn: false }
    item_id: "iid"
  }
""",
}


@pytest.mark.parametrize('key', sorted(MODEL_CONFIGS))
def test_model_trains(key):
  text = DATA_SECTION + 'model_config {\n  model_class: "%s"\n%s}\n' % (
      key, MODEL_CONFIGS[key])
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(6):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)), (key, losses)
  assert losses[-1] < losses[0], (key, losses)


METRIC_LEARNING = """
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate" feature_names: "title"
    wide_deep: DEEP
  }
  metric_learning {
    session_id: "uid"
    input: "item"
    dnn { hidden_units: [16, 8] use_bn: false }
    circle_loss { margin: 0.25 gamma: 32 }
  }
"""


def test_metric_learning_trains():
  text = DATA_SECTION + \
      'model_config {\n  model_class: "CoMetricLearningI2I"\n%s}\n' % \
      METRIC_LEARNING
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk'], 32, seed=3)
  # session ids: 8 groups of 4 items each
  batch['field.uid'] = np.repeat(np.arange(8), 4).astype(np.int64)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(6):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)), losses
  assert losses[-1] < losses[0], losses


def test_dbmtl_cmbf_bottom():
  """DBMTL with a CMBF multimodal bottom (reference
  dbmtl_cmbf_on_movielens.config): the fused image+text encoding feeds
  the task towers."""
  body = """
  feature_groups {
    group_name: "image" feature_names: "img_vec" wide_deep: DEEP
  }
  feature_groups {
    group_name: "text"
    feature_names: "cate" feature_names: "title" wide_deep: DEEP
  }
  feature_groups {
    group_name: "other"
    feature_names: "uid" feature_names: "age" wide_deep: DEEP
  }
  dbmtl {
    bottom_cmbf {
      multi_head_num: 2
      image_multi_head_num: 2
      text_multi_head_num: 2
      text_head_size: 8
      image_head_size: 8
      image_feature_patch_num: 4
      text_self_attention_layer_num: 1
      cross_modal_layer_num: 1
      other_feature_dnn { hidden_units: [8] use_bn: false }
    }
    bottom_dnn { hidden_units: [16] use_bn: false }
    task_towers {
      tower_name: "ctr" label_name: "clk"
      dnn { hidden_units: [8] use_bn: false }
    }
    task_towers {
      tower_name: "cvr" label_name: "clk"
      dnn { hidden_units: [8] use_bn: false }
      relation_tower_names: "ctr"
      relation_dnn { hidden_units: [8] use_bn: false }
    }
  }
"""
  text = DATA_SECTION + 'model_config {\n  model_class: "DBMTL"\n%s}\n' % body
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(6):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses


def test_rocket_euclidean_feature_distillation():
  body = MODEL_CONFIGS['RocketLaunching'].replace(
      'feature_based_distillation: true',
      'feature_based_distillation: true\n'
      '    feature_distillation_function: INNER_PRODUCT')
  text = DATA_SECTION + \
      'model_config {\n  model_class: "RocketLaunching"\n%s}\n' % body
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  state, loss_dict = trainer.train_step(state, sharded)
  assert 'feature_distill' in loss_dict
  assert np.isfinite(float(loss_dict['total_loss']))
