"""Multichip dryrun matrix (VERDICT r3 next-step 9).

Each case builds a REAL pipeline (CSV reader -> transforms -> sampler
splice) and jit-executes one full training step over an explicit device
mesh, so the driver's virtual-CPU-mesh check covers the code paths a
real pod runs: packed tables + EVParams admission, group-level DIN
sequence attention, MMoE multi-task towers, and the negative-sampler
splice feeding the match-model in-batch softmax. Cases run on the
requested mesh size AND a non-power-of-two sub-mesh (6 of 8), whose
group quantum differs (ops/packed_table.py PackMeta).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

_BASE = """
train_input_path: "{train}"
model_dir: ""
train_config {{
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.01 }} }}
    }}
  }}
  num_steps: 1
}}
eval_config {{ metrics_set {{ auc {{}} }} }}
data_config {{
  batch_size: {batch}
  label_fields: "label"
  input_fields {{ input_name: "label" input_type: FLOAT }}
  input_fields {{ input_name: "uid" input_type: STRING }}
  input_fields {{ input_name: "iid" input_type: STRING }}
  input_fields {{ input_name: "cate" input_type: STRING }}
  input_fields {{ input_name: "seq_cate" input_type: STRING }}
  input_type: CSVInput
  {sampler}
}}
feature_config {{
  features {{ input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 200 {ev} }}
  features {{ input_names: "iid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 200 }}
  features {{ input_names: "cate" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 64 }}
  features {{ input_names: "seq_cate" feature_type: SequenceFeature
             embedding_dim: 8 hash_bucket_size: 64 max_seq_len: 6 }}
}}
model_config {{
{body}
}}
"""

_DEEPFM_EV_BODY = """
  model_class: "DeepFM"
  feature_groups { group_name: "deep" feature_names: "uid"
                   feature_names: "iid" feature_names: "cate"
                   wide_deep: DEEP }
  feature_groups { group_name: "wide" feature_names: "iid"
                   wide_deep: WIDE }
  deepfm { dnn { hidden_units: [16, 8] use_bn: false }
           final_dnn { hidden_units: [8] use_bn: false } }
"""

_DIN_SEQ_BODY = """
  model_class: "DeepFM"
  feature_groups {
    group_name: "deep"
    feature_names: "uid" feature_names: "iid" feature_names: "cate"
    wide_deep: DEEP
    sequence_features {
      group_name: "seq"
      seq_att_map { key: "cate" hist_seq: "seq_cate" }
    }
  }
  feature_groups { group_name: "wide" feature_names: "iid"
                   wide_deep: WIDE }
  deepfm { dnn { hidden_units: [16, 8] use_bn: false }
           final_dnn { hidden_units: [8] use_bn: false } }
"""

_MMOE_BODY = """
  model_class: "MMoE"
  feature_groups { group_name: "all" feature_names: "uid"
                   feature_names: "iid" feature_names: "cate"
                   wide_deep: DEEP }
  mmoe {
    expert_dnn { hidden_units: [16] use_bn: false }
    num_expert: 2
    task_towers { tower_name: "ctr" label_name: "label"
                  dnn { hidden_units: [8] use_bn: false } num_class: 1
                  loss_type: CLASSIFICATION weight: 1.0
                  metrics_set { auc {} } }
    task_towers { tower_name: "cvr" label_name: "label"
                  dnn { hidden_units: [8] use_bn: false } num_class: 1
                  loss_type: CLASSIFICATION weight: 1.0
                  metrics_set { auc {} } }
  }
"""

_DSSM_BODY = """
  model_class: "DSSM"
  feature_groups { group_name: "user" feature_names: "uid"
                   feature_names: "seq_cate" wide_deep: DEEP }
  feature_groups { group_name: "item" feature_names: "iid"
                   feature_names: "cate" wide_deep: DEEP }
  dssm {
    user_tower { id: "uid" dnn { hidden_units: [16, 8] use_bn: false } }
    item_tower { id: "iid" dnn { hidden_units: [16, 8] use_bn: false } }
    simi_func: INNER_PRODUCT
  }
  loss_type: SOFTMAX_CROSS_ENTROPY
"""

_SAMPLER = """
  negative_sampler {{
    input_path: "{items}"
    num_sample: 8
    attr_fields: "iid"
    attr_fields: "cate"
    item_id_field: "iid"
  }}
"""


def _write_data(d: str, rows: int = 512):
  rng = np.random.default_rng(0)
  train = os.path.join(d, 'train.csv')
  with open(train, 'w') as f:
    for _ in range(rows):
      L = rng.integers(1, 6)
      f.write('%d,u%d,i%d,c%d,%s\n' % (
          rng.integers(0, 2), rng.integers(0, 40), rng.integers(0, 40),
          rng.integers(0, 8),
          '|'.join('c%d' % c for c in rng.integers(0, 8, L))))
  items = os.path.join(d, 'items.txt')
  with open(items, 'w') as f:
    f.write('id:int64\tweight:float\tfeature:string\n')
    for i in range(40):
      f.write('i%d\t1.0\ti%d:c%d\n' % (i, i, i % 8))
  return train, items


def matrix_cases():
  return {
      'packed_ev': (_DEEPFM_EV_BODY, 'ev_params { filter_freq: 2 }', '',
                    {'EASYREC_PACKED_TABLES': '1'}),
      'din_seq_group': (_DIN_SEQ_BODY, '', '', {}),
      'mmoe': (_MMOE_BODY, '', '', {}),
      'dssm_sampler': (_DSSM_BODY, '', 'sampler', {}),
  }


def run_case(name: str, devices, batch: int) -> float:
  """One matrix case: real pipeline, one sharded train step; returns
  the loss (asserted finite)."""
  from easyrec_tpu.config import get_configs_from_pipeline_str
  from easyrec_tpu.train.trainer import Trainer

  body, ev, sampler_flag, env = matrix_cases()[name]
  d = tempfile.mkdtemp(prefix='dryrun_%s_' % name)
  train, items = _write_data(d)
  sampler = _SAMPLER.format(items=items) if sampler_flag else ''
  text = _BASE.format(train=train, batch=batch, sampler=sampler,
                      ev=ev, body=body)
  saved = {k: os.environ.get(k) for k in env}
  os.environ.update(env)
  try:
    cfg = get_configs_from_pipeline_str(text)
    trainer = Trainer(cfg, devices=devices)
    if env.get('EASYREC_PACKED_TABLES') == '1':
      assert trainer.packed_mode, '%s: packed opt-in did not take' % name
      assert trainer.ev_plan, '%s: ev plan missing' % name
    batch0 = next(iter(trainer.train_input()))
    state = trainer.init_state(batch0)
    state, loss_dict = trainer.train_step(
        state, trainer.rules.shard_batch(batch0))
    loss = float(np.asarray(loss_dict['total_loss']))
    assert np.isfinite(loss), '%s: non-finite loss' % name
    return loss
  finally:
    for k, v in saved.items():
      if v is None:
        os.environ.pop(k, None)
      else:
        os.environ[k] = v


def run_matrix(n_devices: int) -> dict:
  """All cases x {n_devices, non-pow2 sub-mesh}; returns {case: loss}."""
  import jax
  results = {}
  sizes = [n_devices]
  non_pow2 = n_devices - 2
  if n_devices >= 4 and non_pow2 & (non_pow2 - 1):
    sizes.append(non_pow2)
  for size in sizes:
    devices = jax.devices()[:size]
    # batch must divide every mesh size under test: lcm(8, 6) x 2
    batch = 48 if size in (6, 8) else 8 * size
    for case in matrix_cases():
      key = '%s@%d' % (case, size)
      results[key] = run_case(case, devices, batch)
  return results
