"""Knowledge distillation, loss-weight strategies and variational-dropout
feature selection."""

import os

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.train.trainer import Trainer

CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
  log_step_count_steps: 20
  optimizer_config {{
    adam_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.005 }} }}
    }}
  }}
  num_steps: {num_steps}
  save_checkpoints_steps: 500
}}
eval_config {{ metrics_set {{ auc {{}} }} }}
data_config {{
  batch_size: 256
  label_fields: "label"
  input_fields {{ input_name: "label" input_type: FLOAT }}
  input_fields {{ input_name: "teacher" input_type: FLOAT }}
  input_fields {{ input_name: "d1" input_type: FLOAT }}
  input_fields {{ input_name: "noise" input_type: FLOAT }}
  input_fields {{ input_name: "c1" input_type: STRING }}
  input_fields {{ input_name: "c2" input_type: STRING }}
  input_type: CSVInput
}}
feature_config {{
  features {{ input_names: "d1" feature_type: RawFeature embedding_dim: 8 }}
  features {{ input_names: "noise" feature_type: RawFeature
              embedding_dim: 8 }}
  features {{ input_names: "c1" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 200 }}
  features {{ input_names: "c2" feature_type: IdFeature
              embedding_dim: 8 hash_bucket_size: 200 }}
}}
model_config {{
  model_class: "{model_class}"
  {model_body}
}}
"""


def _make_csv(path, n, seed):
  """label depends on d1 + id buckets; 'noise' is pure noise; 'teacher'
  is a noisy soft version of the true probability."""
  rng = np.random.default_rng(seed)
  c1 = rng.integers(0, 50, n)
  c2 = rng.integers(0, 30, n)
  d1 = rng.random(n)
  noise = rng.random(n)
  score = 0.6 * (c1 % 7) - 1.0 * (c2 % 3) + 3.0 * d1 - 2.0
  prob = 1.0 / (1.0 + np.exp(-score))
  label = (rng.random(n) < prob).astype(np.int32)
  teacher = np.clip(prob + rng.normal(0, 0.05, n), 0.01, 0.99)
  with open(path, 'w') as f:
    for i in range(n):
      f.write('%d,%.4f,%.4f,%.4f,u%d,v%d\n' %
              (label[i], teacher[i], d1[i], noise[i], c1[i], c2[i]))


def _write(tmp_path, model_class, body, num_steps=120):
  train = os.path.join(str(tmp_path), 'train.csv')
  evalp = os.path.join(str(tmp_path), 'eval.csv')
  _make_csv(train, 4096, 1)
  _make_csv(evalp, 1024, 2)
  text = CONFIG.format(train=train, eval=evalp,
                       model_dir=os.path.join(str(tmp_path), 'ckpt'),
                       num_steps=num_steps, model_class=model_class,
                       model_body=body)
  path = os.path.join(str(tmp_path), 'pipeline.config')
  with open(path, 'w') as f:
    f.write(text)
  return path


GROUPS = """
  feature_groups {
    group_name: "deep"
    feature_names: "d1" feature_names: "noise"
    feature_names: "c1" feature_names: "c2"
    wide_deep: DEEP
  }
"""

KD_BODY = GROUPS + """
  feature_groups {
    group_name: "wide"
    feature_names: "c1" feature_names: "c2"
    wide_deep: WIDE
  }
  deepfm {
    dnn { hidden_units: [32, 16] use_bn: false }
  }
  kd {
    loss_name: "kd_kl"
    soft_label_name: "teacher"
    label_is_logits: false
    pred_is_logits: true
    loss_type: KL_DIVERGENCE_LOSS
    temperature: 2.0
    loss_weight: 1.0
  }
"""

UNCERTAINTY_BODY = GROUPS + """
  feature_groups {
    group_name: "wide"
    feature_names: "c1" feature_names: "c2"
    wide_deep: WIDE
  }
  deepfm {
    dnn { hidden_units: [32, 16] use_bn: false }
  }
  losses { loss_type: CLASSIFICATION weight: 1.0 }
  losses { binary_focal_loss { gamma: 2.0 } weight: 1.0
           loss_type: BINARY_FOCAL_LOSS }
  loss_weight_strategy: Uncertainty
"""

VD_BODY = GROUPS + """
  backbone {
    blocks {
      name: "feat"
      inputs { feature_group_name: "deep" }
      input_layer {}
    }
    blocks {
      name: "mlp"
      inputs { block_name: "feat" }
      keras_layer {
        class_name: "MLP"
        mlp { hidden_units: 32 hidden_units: 16 use_bn: false }
      }
    }
  }
  variational_dropout { regularization_lambda: 0.02 }
"""


def test_kd_distillation_trains(tmp_path):
  cfg = get_configs_from_pipeline_file(_write(tmp_path, 'DeepFM', KD_BODY))
  trainer = Trainer(cfg)
  # teacher column rides along as field.teacher
  batch = next(iter(trainer.train_input()))
  assert 'field.teacher' in batch
  result = trainer.fit()
  state = result['state']
  # kd loss contributed: run one loss eval to inspect the dict
  sharded = trainer.rules.shard_batch(batch)
  _, loss, _, _ = trainer.eval_step(state, sharded,
                                 trainer.metrics.init_states())
  assert np.isfinite(float(loss))
  assert result['eval_metrics']['auc'] > 0.7


def test_uncertainty_loss_weights(tmp_path):
  cfg = get_configs_from_pipeline_file(
      _write(tmp_path, 'DeepFM', UNCERTAINTY_BODY, num_steps=60))
  trainer = Trainer(cfg)
  result = trainer.fit()
  # the learned log-variance weights exist and moved
  import jax
  leaves = {tuple(p.key for p in path if hasattr(p, 'key')): leaf
            for path, leaf in
            jax.tree_util.tree_leaves_with_path(result['state'].params)}
  w = [v for k, v in leaves.items() if k and k[-1] == 'loss_uncertainty']
  assert len(w) == 1 and w[0].shape == (2,)
  assert result['eval_metrics']['auc'] > 0.65


def test_variational_dropout_importance(tmp_path):
  from easyrec_tpu.tools.feature_selection import feature_importance
  cfg = get_configs_from_pipeline_file(
      _write(tmp_path, 'RankModel', VD_BODY, num_steps=250))
  trainer = Trainer(cfg)
  result = trainer.fit()
  assert result['eval_metrics']['auc'] > 0.65
  imp = feature_importance(cfg)
  assert set(imp) == {'d1', 'noise', 'c1', 'c2'}
  assert all(0.0 <= v <= 1.0 for v in imp.values())
  # the informative dense feature should outrank pure noise
  assert imp['d1'] > imp['noise'], imp
