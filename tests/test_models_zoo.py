"""Model-zoo matrix: every registered family builds, trains steps with
finite decreasing loss, and evaluates — on synthetic packed batches over
the 8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_str
from easyrec_tpu.train.trainer import Trainer
from easyrec_tpu.utils.synthetic import synthetic_batch

DATA_SECTION = """
train_input_path: "synthetic"
eval_input_path: "synthetic"
model_dir: "/tmp/zoo_test"
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
  label_fields: "buy"
  input_fields { input_name: "clk" input_type: FLOAT }
  input_fields { input_name: "buy" input_type: FLOAT }
  input_fields { input_name: "uid" input_type: STRING }
  input_fields { input_name: "iid" input_type: STRING }
  input_fields { input_name: "cate" input_type: STRING }
  input_fields { input_name: "tags" input_type: STRING }
  input_fields { input_name: "age" input_type: FLOAT }
  input_fields { input_name: "price" input_type: FLOAT }
  input_fields { input_name: "seq_cate" input_type: STRING }
  input_type: DummyInput
}
feature_config {
  features { input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 100 }
  features { input_names: "iid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 100 }
  features { input_names: "cate" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 40 }
  features { input_names: "tags" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 60 max_multi_len: 3 }
  features { input_names: "age" feature_type: RawFeature embedding_dim: 8 }
  features { input_names: "price" feature_type: RawFeature
             embedding_dim: 8 }
  features { input_names: "seq_cate" feature_type: SequenceFeature
             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6 }
}
"""

USER_ITEM_GROUPS = """
  feature_groups {
    group_name: "user"
    feature_names: "uid" feature_names: "age" feature_names: "tags"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate" feature_names: "price"
    wide_deep: DEEP
  }
"""

ALL_GROUP = """
  feature_groups {
    group_name: "all"
    feature_names: "uid" feature_names: "iid" feature_names: "cate"
    feature_names: "tags" feature_names: "age" feature_names: "price"
    wide_deep: DEEP
  }
"""

TASK_TOWERS = """
    task_towers {
      tower_name: "ctr" label_name: "clk"
      dnn { hidden_units: [16, 8] use_bn: false }
    }
    task_towers {
      tower_name: "cvr" label_name: "buy"
      dnn { hidden_units: [16, 8] use_bn: false }
    }
"""

MODEL_CONFIGS = {
    'WideAndDeep': ALL_GROUP.replace('group_name: "all"',
                                     'group_name: "deep"') + """
  feature_groups {
    group_name: "wide"
    feature_names: "uid" feature_names: "iid"
    wide_deep: WIDE
  }
  wide_and_deep {
    dnn { hidden_units: [16, 8] use_bn: false }
  }
""",
    'MultiTower': USER_ITEM_GROUPS + """
  multi_tower {
    towers { input: "user" dnn { hidden_units: [16, 8] use_bn: false } }
    towers { input: "item" dnn { hidden_units: [16, 8] use_bn: false } }
    final_dnn { hidden_units: [16] use_bn: false }
  }
""",
    'MultiTowerDIN': USER_ITEM_GROUPS + """
  seq_att_groups {
    group_name: "din"
    seq_att_map { key: "cate" hist_seq: "seq_cate" }
  }
  multi_tower {
    towers { input: "user" dnn { hidden_units: [16, 8] use_bn: false } }
    towers { input: "item" dnn { hidden_units: [16, 8] use_bn: false } }
    din_towers { input: "din" dnn { hidden_units: [8, 1] } }
    final_dnn { hidden_units: [16] use_bn: false }
  }
""",
    'MultiTowerBST': USER_ITEM_GROUPS + """
  seq_att_groups {
    group_name: "bst"
    seq_att_map { key: "cate" hist_seq: "seq_cate" }
  }
  multi_tower {
    towers { input: "user" dnn { hidden_units: [16, 8] use_bn: false } }
    bst_towers { input: "bst" seq_len: 7 multi_head_size: 2 }
    final_dnn { hidden_units: [16] use_bn: false }
  }
""",
    'DCN': """
  feature_groups {
    group_name: "deep"
    feature_names: "uid" feature_names: "iid" feature_names: "age"
    wide_deep: DEEP
  }
  dcn {
    deep_tower { input: "deep" dnn { hidden_units: [16] use_bn: false } }
    cross_tower { input: "deep" cross_num: 2 }
    final_dnn { hidden_units: [16] use_bn: false }
  }
""",
    'AutoInt': ALL_GROUP + """
  autoint {
    multi_head_num: 2
    multi_head_size: 4
    interacting_layer_num: 2
  }
""",
    'DLRM': """
  feature_groups {
    group_name: "dense"
    feature_names: "age" feature_names: "price"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "sparse"
    feature_names: "uid" feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }
  dlrm {
    bot_dnn { hidden_units: [16, 8] use_bn: false }
    top_dnn { hidden_units: [16, 8] use_bn: false }
  }
""",
    'FM': """
  feature_groups {
    group_name: "deep"
    feature_names: "uid" feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "wide"
    feature_names: "uid" feature_names: "iid" feature_names: "cate"
    wide_deep: WIDE
  }
  fm {}
""",
    'DSSM': USER_ITEM_GROUPS + """
  dssm {
    user_tower { id: "uid" dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { id: "iid" dnn { hidden_units: [16, 8] use_bn: false } }
    simi_func: COSINE
    temperature: 0.1
    item_id: "iid"
  }
  loss_type: SOFTMAX_CROSS_ENTROPY
""",
    'DSSM_pointwise': USER_ITEM_GROUPS + """
  dssm {
    user_tower { id: "uid" dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { id: "iid" dnn { hidden_units: [16, 8] use_bn: false } }
    simi_func: INNER_PRODUCT
    scale_simi: true
  }
  loss_type: CLASSIFICATION
""",
    'DSSM_SENet': USER_ITEM_GROUPS + """
  dssm_senet {
    user_tower { id: "uid" senet { reduction_ratio: 2 num_squeeze_group: 1 }
                 dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { id: "iid" senet { reduction_ratio: 2 num_squeeze_group: 1 }
                 dnn { hidden_units: [16, 8] use_bn: false } }
  }
  loss_type: SOFTMAX_CROSS_ENTROPY
""",
    'DAT': USER_ITEM_GROUPS + """
  dat {
    user_tower { id: "uid" dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { id: "iid" dnn { hidden_units: [16, 8] use_bn: false } }
  }
  loss_type: SOFTMAX_CROSS_ENTROPY
""",
    'MIND': """
  feature_groups {
    group_name: "user"
    feature_names: "uid" feature_names: "age"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "hist"
    feature_names: "seq_cate"
    wide_deep: DEEP
  }
  mind {
    user_dnn { hidden_units: [16] use_bn: false }
    item_dnn { hidden_units: [16] use_bn: false }
    concat_dnn { hidden_units: [16] use_bn: false }
    capsule_config { max_k: 3 max_seq_len: 6 high_dim: 8 }
    item_id: "iid"
  }
  loss_type: SOFTMAX_CROSS_ENTROPY
""",
    'SimpleMultiTask': ALL_GROUP + """
  simple_multi_task {""" + TASK_TOWERS + """  }
""",
    'MMoE': ALL_GROUP + """
  mmoe {
    expert_dnn { hidden_units: [16, 8] use_bn: false }
    num_expert: 3
""" + TASK_TOWERS + """  }
""",
    'ESMM': """
  feature_groups {
    group_name: "all"
    feature_names: "uid" feature_names: "iid" feature_names: "age"
    wide_deep: DEEP
  }
  esmm {
    groups { input: "all" dnn { hidden_units: [16, 8] use_bn: false } }
    ctr_tower { tower_name: "ctr" label_name: "clk"
                dnn { hidden_units: [8] use_bn: false } }
    cvr_tower { tower_name: "cvr" label_name: "buy"
                dnn { hidden_units: [8] use_bn: false } }
  }
""",
    'DBMTL': ALL_GROUP + """
  dbmtl {
    bottom_dnn { hidden_units: [16] use_bn: false }
    task_towers {
      tower_name: "ctr" label_name: "clk"
      dnn { hidden_units: [8] use_bn: false }
    }
    task_towers {
      tower_name: "cvr" label_name: "buy"
      dnn { hidden_units: [8] use_bn: false }
      relation_tower_names: "ctr"
      relation_dnn { hidden_units: [8] use_bn: false }
    }
  }
""",
    'PLE': ALL_GROUP + """
  ple {
    extraction_networks {
      network_name: "layer1"
      expert_num_per_task: 2
      share_num: 2
      task_expert_net { hidden_units: [16, 8] use_bn: false }
      share_expert_net { hidden_units: [16, 8] use_bn: false }
    }
""" + TASK_TOWERS + """  }
""",
    'MultiTowerRecall': USER_ITEM_GROUPS + """
  multi_tower_recall {
    user_tower { dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { dnn { hidden_units: [16, 8] use_bn: false } }
    final_dnn { hidden_units: [8] use_bn: false }
  }
""",
    'DropoutNet': """
  feature_groups {
    group_name: "user_content"
    feature_names: "uid" wide_deep: DEEP
  }
  feature_groups {
    group_name: "user_preference"
    feature_names: "age" feature_names: "tags" wide_deep: DEEP
  }
  feature_groups {
    group_name: "item_content"
    feature_names: "iid" wide_deep: DEEP
  }
  feature_groups {
    group_name: "item_preference"
    feature_names: "cate" feature_names: "price" wide_deep: DEEP
  }
  dropoutnet {
    user_content { hidden_units: [8] use_bn: false }
    user_preference { hidden_units: [8] use_bn: false }
    item_content { hidden_units: [8] use_bn: false }
    item_preference { hidden_units: [8] use_bn: false }
    user_tower { hidden_units: [8] use_bn: false }
    item_tower { hidden_units: [8] use_bn: false }
    softmax_loss { num_negative_samples: 3 }
  }
""",
}


def _model_class(key: str) -> str:
  return key.split('_pointwise')[0]


@pytest.mark.parametrize('key', sorted(MODEL_CONFIGS))
def test_model_trains(key):
  text = DATA_SECTION + 'model_config {\n  model_class: "%s"\n%s}\n' % (
      _model_class(key), MODEL_CONFIGS[key])
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk', 'buy'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(5):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)), (key, losses)
  # same batch repeated must be learnable: loss drops
  assert losses[-1] < losses[0], (key, losses)
  # eval step runs
  ms, eval_loss, mi, _ = trainer.eval_step(state, sharded,
                                        trainer.metrics.init_states())
  assert np.isfinite(float(eval_loss))


def test_dbmtl_order_calibrate_loss():
  """ESMM-style order calibration: cvr tower's prob is pushed below its
  ctr relation tower's (reference multi_task_model.py:241-251)."""
  body = ALL_GROUP + """
  dbmtl {
    bottom_dnn { hidden_units: [16] use_bn: false }
    task_towers {
      tower_name: "ctr" label_name: "clk"
      dnn { hidden_units: [8] use_bn: false }
    }
    task_towers {
      tower_name: "cvr" label_name: "buy"
      dnn { hidden_units: [8] use_bn: false }
      relation_tower_names: "ctr"
      relation_dnn { hidden_units: [8] use_bn: false }
      losses { loss_type: CLASSIFICATION weight: 1.0 }
      losses { loss_type: ORDER_CALIBRATE_LOSS weight: 0.5 }
    }
  }
"""
  text = DATA_SECTION + 'model_config {\n  model_class: "DBMTL"\n%s}\n' % body
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk', 'buy'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(5):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert 'order_calibrate_loss_ctr_cvr' in loss_dict, loss_dict.keys()
  assert 'classification_loss_cvr' in loss_dict, loss_dict.keys()
  assert float(loss_dict['order_calibrate_loss_ctr_cvr']) >= 0.0
  assert all(np.isfinite(losses)), losses
  assert losses[-1] < losses[0], losses


MIND_TIME_ID_SECTION = DATA_SECTION.replace(
    'input_fields { input_name: "seq_cate" input_type: STRING }',
    'input_fields { input_name: "seq_cate" input_type: STRING }\n'
    '  input_fields { input_name: "seq_time" input_type: STRING }').replace(
    'features { input_names: "seq_cate" feature_type: SequenceFeature\n'
    '             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6 }',
    'features { input_names: "seq_cate" feature_type: SequenceFeature\n'
    '             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6 }\n'
    '  features { input_names: "seq_time" feature_type: SequenceFeature\n'
    '             embedding_dim: 1 hash_bucket_size: 40 max_seq_len: 6 }')


def test_mind_time_id_weighting():
  """MIND time_id_fea softmax-reweights the history sequence
  (reference mind.py:95-101: dim-1 time embedding, padding masked)."""
  assert 'seq_time' in MIND_TIME_ID_SECTION  # replace() took effect
  body = """
  feature_groups {
    group_name: "user"
    feature_names: "uid" feature_names: "age"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "hist"
    feature_names: "seq_cate" feature_names: "seq_time"
    wide_deep: DEEP
  }
  mind {
    user_dnn { hidden_units: [16] use_bn: false }
    item_dnn { hidden_units: [16] use_bn: false }
    concat_dnn { hidden_units: [16] use_bn: false }
    capsule_config { max_k: 3 max_seq_len: 6 high_dim: 8 }
    item_id: "iid"
    time_id_fea: "seq_time"
  }
  loss_type: SOFTMAX_CROSS_ENTROPY
"""
  text = MIND_TIME_ID_SECTION + \
      'model_config {\n  model_class: "MIND"\n%s}\n' % body
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk', 'buy'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(5):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)), losses
  assert losses[-1] < losses[0], losses


def test_numeric_raw_sequence_feature():
  """SequenceFeature with sub_feature_type RawFeature + seq_multi_sep:
  '0.1;0.2|0.3;0.4' -> [B, L, raw_input_dim] dense sequence consumed by
  a tower via the default masked-mean combiner (reference
  dbmtl_on_multi_numeric_raw_sequence_feature_taobao.config)."""
  section = DATA_SECTION.replace(
      'input_fields { input_name: "seq_cate" input_type: STRING }',
      'input_fields { input_name: "seq_cate" input_type: STRING }\n'
      '  input_fields { input_name: "seq_price" input_type: STRING }'
  ).replace(
      'features { input_names: "seq_cate" feature_type: SequenceFeature\n'
      '             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6 }',
      'features { input_names: "seq_cate" feature_type: SequenceFeature\n'
      '             embedding_dim: 8 hash_bucket_size: 40 max_seq_len: 6 }\n'
      '  features { input_names: "seq_price" feature_type: SequenceFeature\n'
      '             sub_feature_type: RawFeature raw_input_dim: 2\n'
      '             separator: "|" seq_multi_sep: ";" max_seq_len: 6 }')
  assert 'seq_price' in section
  body = """
  feature_groups {
    group_name: "user"
    feature_names: "uid" feature_names: "seq_price"
    wide_deep: DEEP
  }
  feature_groups {
    group_name: "item"
    feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
  }
  multi_tower {
    towers { input: "user" dnn { hidden_units: [16, 8] use_bn: false } }
    towers { input: "item" dnn { hidden_units: [16, 8] use_bn: false } }
    final_dnn { hidden_units: [16] use_bn: false }
  }
"""
  text = section + 'model_config {\n  model_class: "MultiTower"\n%s}\n' % body
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)

  # transform-level check: two-level parse
  from easyrec_tpu.features import transforms as tr
  t = [x for x in trainer.specs.values() if x.name == 'seq_price'][0]
  cols = {'seq_price': np.array(['0.1;0.2|0.3;0.4', '', '5;6'],
                                dtype=object)}
  out = tr.build_transforms({'seq_price': t})[0](cols)
  vals, mask = out[t.dense_key], out[t.mask_key]
  assert vals.shape == (3, 6, 2)
  np.testing.assert_allclose(vals[0, 0], [0.1, 0.2])
  np.testing.assert_allclose(vals[0, 1], [0.3, 0.4])
  np.testing.assert_allclose(vals[2, 0], [5.0, 6.0])
  np.testing.assert_allclose(mask[:, 0], [1, 0, 1])

  batch = synthetic_batch(trainer.specs, ['clk', 'buy'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(5):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)), losses
  assert losses[-1] < losses[0], losses


def test_din_key_transform_and_seq_dnn():
  """seq_att group options: allow_key_transform projects a mismatched
  key to the history dim; seq_dnn post-processes the attention output;
  need_key_feature=false drops the key (mean-pooled query)."""
  section = DATA_SECTION.replace(
      'features { input_names: "cate" feature_type: IdFeature\n'
      '             embedding_dim: 8 hash_bucket_size: 40 }',
      'features { input_names: "cate" feature_type: IdFeature\n'
      '             embedding_dim: 12 hash_bucket_size: 40 }')
  body = USER_ITEM_GROUPS + """
  seq_att_groups {
    group_name: "din"
    seq_att_map { key: "cate" hist_seq: "seq_cate" }
    allow_key_transform: true
    seq_dnn { hidden_units: [8] use_bn: false }
  }
  multi_tower {
    towers { input: "user" dnn { hidden_units: [16, 8] use_bn: false } }
    din_towers { input: "din" dnn { hidden_units: [8, 1] } }
    final_dnn { hidden_units: [16] use_bn: false }
  }
"""
  # key dim 12 vs hist dim 8 -> transform required and allowed
  text = section + 'model_config {\n  model_class: "MultiTowerDIN"\n%s}\n' \
      % body
  cfg = get_configs_from_pipeline_str(text)
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['clk', 'buy'], 32, seed=3)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  losses = []
  for _ in range(5):
    state, loss_dict = trainer.train_step(state, sharded)
    losses.append(float(loss_dict['total_loss']))
  assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses

  # without allow_key_transform the mismatch is a clear error
  bad = text.replace('allow_key_transform: true', '')
  cfg_bad = get_configs_from_pipeline_str(bad)
  trainer_bad = Trainer(cfg_bad)
  import pytest as _pytest
  with _pytest.raises(ValueError, match='allow_key_transform'):
    b = synthetic_batch(trainer_bad.specs, ['clk', 'buy'], 32, seed=3)
    trainer_bad.init_state(b)

  # need_key_feature=false: no key needed at all
  nk = text.replace('allow_key_transform: true',
                    'need_key_feature: false')
  cfg_nk = get_configs_from_pipeline_str(nk)
  trainer_nk = Trainer(cfg_nk)
  b = synthetic_batch(trainer_nk.specs, ['clk', 'buy'], 32, seed=3)
  state = trainer_nk.init_state(b)
  sharded = trainer_nk.rules.shard_batch(b)
  _, loss_dict = trainer_nk.train_step(state, sharded)
  assert np.isfinite(float(loss_dict['total_loss']))


def test_registry_completeness():
  """zoo.py imports fail loudly (no try/except), and every reference
  model_class name is present in the registry — a transitively broken
  import would otherwise silently drop a whole family (VERDICT r1)."""
  from easyrec_tpu.models import zoo  # noqa: F401
  from easyrec_tpu.utils.registry import MODELS
  expected = {
      'autoint', 'cmbf', 'cometriclearningi2i', 'dat', 'dbmtl', 'dcn',
      'deepfm', 'dlrm', 'dropoutnet', 'dssm', 'dssm_senet', 'dummymodel',
      'esmm', 'fm', 'matchmodel', 'mind', 'mmoe', 'multitaskmodel',
      'multitower', 'multitowerbst', 'multitowerdin', 'multitowerrecall',
      'pdn', 'ple', 'rankmodel', 'rocketlaunching', 'simplemultitask',
      'uniter', 'wideanddeep',
  }
  got = set(MODELS.keys())
  assert expected <= got, sorted(expected - got)
