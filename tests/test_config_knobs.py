"""Long-tail config knobs: default_val fill, eval num_examples cap,
save_checkpoints_secs, custom early_stop_func, ZILN loss params."""

import os
import time

import numpy as np
import pytest

from easyrec_tpu.config import (get_configs_from_pipeline_file,
                                get_configs_from_pipeline_str)
from easyrec_tpu.config import config_util
from easyrec_tpu.data.input_pipeline import InputPipeline
from tests import fixtures


def test_default_val_fills_missing(tmp_path):
  path = os.path.join(str(tmp_path), 'd.csv')
  with open(path, 'w') as f:
    f.write('1,0.5,c1\n')
    f.write('0,,c2\n')          # missing numeric -> default_val
    f.write('1,2.5,c3\n')
  text = """
train_input_path: "%s"
eval_input_path: "%s"
data_config {
  batch_size: 4
  num_epochs: 1
  shuffle: false
  label_fields: "label"
  input_fields { input_name: "label" input_type: FLOAT }
  input_fields { input_name: "num" input_type: FLOAT
                 default_val: "7.5" }
  input_fields { input_name: "cat" input_type: STRING }
  input_type: CSVInput
}
feature_config {
  features { input_names: "num" feature_type: RawFeature }
  features { input_names: "cat" feature_type: IdFeature
              embedding_dim: 4 hash_bucket_size: 50 }
}
model_config { model_class: "DummyModel" }
""" % (path, path)
  cfg = get_configs_from_pipeline_str(text)
  pipe = InputPipeline(cfg.data_config,
                       config_util.get_feature_configs(cfg), path,
                       mode='eval')
  batch = next(iter(pipe))
  np.testing.assert_allclose(batch['feat.num.dense'][:3, 0],
                             [0.5, 7.5, 2.5])


def test_eval_num_examples_caps_batches(tmp_path):
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=5, batch_size=64))
  cfg.data_config.eval_batch_size = 64
  cfg.eval_config.num_examples = 128          # -> 2 batches
  from easyrec_tpu.train.trainer import Trainer
  trainer = Trainer(cfg)
  from easyrec_tpu.utils.synthetic import synthetic_batch
  batch = synthetic_batch(trainer.specs, ['label'], 64, seed=1)
  state = trainer.init_state(batch)

  consumed = []

  def counting_iter():
    for i in range(100):
      consumed.append(i)
      yield batch
  trainer.evaluate(state, eval_iter=counting_iter())
  assert len(consumed) == 2, consumed


def test_save_checkpoints_secs(tmp_path):
  cfg_path = fixtures.write_pipeline(
      tmp_path, num_steps=40,
      extra='')
  cfg = get_configs_from_pipeline_file(cfg_path)
  cfg.train_config.save_checkpoints_steps = 100000   # never by step
  cfg.train_config.save_checkpoints_secs = 1
  from easyrec_tpu.train.trainer import Trainer
  trainer = Trainer(cfg)
  result = trainer.fit()
  ckpt_dir = os.path.join(cfg.model_dir, 'checkpoints')
  steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
  # a time-triggered save happened before the final forced save
  assert len(steps) >= 2, steps
  assert steps[0] < result['global_step'], steps


def stop_when_good(eval_results, params):
  return eval_results.get('auc', 0.0) > float(params)


def test_custom_early_stop_func(tmp_path):
  cfg_path = fixtures.write_pipeline(
      tmp_path, num_steps=400,
      extra='export_config { '
            'early_stop_func: "tests.test_config_knobs.stop_when_good" '
            'early_stop_params: "0.55" }\n')
  cfg = get_configs_from_pipeline_file(cfg_path)
  cfg.train_config.save_checkpoints_steps = 50  # eval cadence
  from easyrec_tpu.train.trainer import Trainer
  trainer = Trainer(cfg)
  result = trainer.fit()
  # the synthetic data reaches auc>0.55 quickly -> stops well before 400
  assert result['global_step'] < 400, result['global_step']


def test_ziln_loss_params():
  import jax.numpy as jnp
  from easyrec_tpu.losses.losses import ziln_loss
  rng = np.random.default_rng(0)
  labels = jnp.asarray(rng.uniform(0, 10, 64) *
                       (rng.uniform(size=64) > 0.4))
  logits = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
  base = float(ziln_loss(labels, logits))
  reg = float(ziln_loss(labels, logits, mu_regularization=1.0,
                        sigma_regularization=1.0))
  assert reg > base
  half = float(ziln_loss(labels, logits, classification_weight=0.5,
                         regression_weight=0.5))
  assert abs(half - base / 2) < 1e-4


def test_use_moving_average_ema_params(tmp_path):
  """Optimizer.use_moving_average keeps an EMA of the dense params in
  the optimizer state; eval/export read it via Trainer.eval_params."""
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=30))
  opt = cfg.train_config.optimizer_config[0]
  opt.use_moving_average = True
  opt.moving_average_decay = 0.9
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.optim.builder import find_param_ema
  import jax
  trainer = Trainer(cfg)
  from easyrec_tpu.utils.synthetic import synthetic_batch
  batch = synthetic_batch(trainer.specs, ['label'], 64, seed=1)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  for _ in range(5):
    state, _ = trainer.train_step(state, sharded)
  ema = find_param_ema(state.opt_state)
  assert ema is not None
  live = jax.tree_util.tree_leaves(state.params)
  avg = jax.tree_util.tree_leaves(trainer.eval_params(state))
  diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
           for a, b in zip(live, avg)]
  assert max(diffs) > 0, 'EMA should lag the live params'
  # eval + export consume the EMA without errors
  metrics = trainer.evaluate(state, eval_iter=[batch])
  assert np.isfinite(metrics['auc'])


def test_no_moving_average_keeps_live_params(tmp_path):
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=5))
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.synthetic import synthetic_batch
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['label'], 32, seed=1)
  state = trainer.init_state(batch)
  assert trainer.eval_params(state) is state.params


def test_ftrl_l2_shrinkage():
  import jax.numpy as jnp
  from easyrec_tpu.optim.sparse import sparse_ftrl
  table = jnp.ones((10, 4), jnp.float32)
  uids = jnp.array([1, 3])
  grads = jnp.full((2, 4), 0.5, jnp.float32)
  lr, step = jnp.float32(0.1), jnp.int32(1)
  base = sparse_ftrl()
  shrunk = sparse_ftrl(l2_shrinkage=0.5)
  t1, _ = base.update_rows(table, base.init(table), uids, grads, lr,
                           step)
  t2, _ = shrunk.update_rows(table, shrunk.init(table), uids, grads, lr,
                             step)
  # shrinkage adds 2*l2s*w to the z-gradient -> different update
  assert float(jnp.abs(t1[1] - t2[1]).max()) > 0
  # untouched rows identical
  assert float(jnp.abs(t1[0] - t2[0]).max()) == 0


def test_exports_to_keep_gc(tmp_path):
  import time as _time
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=5))
  cfg.export_config.exports_to_keep = 2
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.export.saved_model import export_saved_model
  from easyrec_tpu.utils.synthetic import synthetic_batch
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, ['label'], 32, seed=1)
  state = trainer.init_state(batch)
  base = os.path.join(str(tmp_path), 'exports')
  dirs = []
  for _ in range(3):
    dirs.append(export_saved_model(trainer, state, base))
    _time.sleep(1.1)        # distinct timestamps
  stamps = sorted(d for d in os.listdir(base) if d.isdigit())
  assert len(stamps) == 2, stamps
  assert os.path.basename(dirs[-1]) in stamps
  assert os.path.basename(dirs[0]) not in stamps


def test_default_val_fills_empty_strings(tmp_path):
  """STRING default_val applies to empty csv cells (they parse as ''
  rather than null; code-review regression)."""
  path = os.path.join(str(tmp_path), 'd.csv')
  with open(path, 'w') as f:
    f.write('1,0.5,c1\n')
    f.write('0,0.1,\n')
  text = """
train_input_path: "%s"
eval_input_path: "%s"
data_config {
  batch_size: 4
  num_epochs: 1
  shuffle: false
  label_fields: "label"
  input_fields { input_name: "label" input_type: FLOAT }
  input_fields { input_name: "num" input_type: FLOAT }
  input_fields { input_name: "cat" input_type: STRING
                 default_val: "unknown" }
  input_type: CSVInput
}
feature_config {
  features { input_names: "num" feature_type: RawFeature }
  features { input_names: "cat" feature_type: IdFeature
              embedding_dim: 4 hash_bucket_size: 50 }
}
model_config { model_class: "DummyModel" }
""" % (path, path)
  cfg = get_configs_from_pipeline_str(text)
  pipe = InputPipeline(cfg.data_config,
                       config_util.get_feature_configs(cfg), path,
                       mode='eval')
  batch = next(iter(pipe))
  from easyrec_tpu.ops import hashing
  exp = hashing.hash_strings(np.array(['unknown'], dtype=object), 50)
  assert batch['feat.cat.ids'][1, 0] == exp[0]
  assert batch['feat.cat.weights'][1, 0] == 1.0
