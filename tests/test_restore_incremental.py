"""Fine-tune warm start, gradient freezing, incremental save/consume."""

import glob
import os

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.train.trainer import Trainer
from tests import fixtures


def test_fine_tune_restore_and_freeze(tmp_path):
  for sub in ('base', 'ft', 'frz'):
    (tmp_path / sub).mkdir()
  # train a base model
  base_cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path / 'base', num_steps=80))
  base = Trainer(base_cfg)
  base_res = base.fit()

  # warm-start a second model from it, with c1's hash space enlarged
  # (shape-adapted restore) and its embedding frozen
  cfg_path = fixtures.write_pipeline(tmp_path / 'ft', num_steps=40)
  ft_cfg = get_configs_from_pipeline_file(cfg_path)
  ft_cfg.train_config.fine_tune_checkpoint = base_cfg.model_dir
  ft_cfg.train_config.force_restore_shape_compatible = True
  ft = Trainer(ft_cfg)
  res = ft.fit()
  assert np.isfinite(res['eval_metrics']['loss'])
  # warm start should put the new model in a good region immediately
  assert res['eval_metrics']['auc'] > 0.7

  # frozen dense params stay exactly at init
  frz_cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path / 'frz', num_steps=30))
  frz_cfg.train_config.freeze_gradient.append('final_dnn')
  frz = Trainer(frz_cfg)
  first = next(iter(frz.train_input()))
  state0 = frz.init_state(first)
  import jax
  def _named(params):
    return {'/'.join(str(p.key) for p in path if hasattr(p, 'key')): leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)}
  before = {k: np.asarray(v) for k, v in _named(state0.params).items()}
  state = state0
  sharded = frz.rules.shard_batch(first)
  for _ in range(5):
    state, _ = frz.train_step(state, sharded)
  after = _named(state.params)
  frozen = [k for k in before if 'final_dnn' in k]
  moved = [k for k in before if 'final_dnn' not in k and 'dense' in k]
  assert frozen and moved
  for k in frozen:
    np.testing.assert_array_equal(before[k], np.asarray(after[k]))
  assert any(not np.array_equal(before[k], np.asarray(after[k]))
             for k in moved)


def test_incremental_publish_and_consume(tmp_path):
  from easyrec_tpu.export.predictor import Predictor
  from easyrec_tpu.export.saved_model import export_saved_model
  from easyrec_tpu.train import incremental as incr_lib

  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=60)
  cfg = get_configs_from_pipeline_file(cfg_path)
  cfg.train_config.incr_save_config.fs.incr_save_dir = 'incr_save'
  cfg.train_config.incr_save_config.sparse_save_steps = 20
  trainer = Trainer(cfg)

  # export an EARLY snapshot, keep training, publish deltas
  train_iter = iter(trainer.train_input())
  first = next(train_iter)
  state = trainer.init_state(first)
  export_dir = export_saved_model(trainer, state,
                                  os.path.join(str(tmp_path), 'export'))

  from easyrec_tpu.train.incremental import IncrementalPublisher
  pub = IncrementalPublisher(cfg.train_config.incr_save_config,
                             cfg.model_dir)
  pub.publish(state, 0)
  sharded = trainer.rules.shard_batch(first)
  for i in range(10):
    state, _ = trainer.train_step(state, sharded)
  pub.publish(state, 10)
  updates = incr_lib.list_updates(pub.directory)
  assert len(updates) == 1

  # stale predictor vs updated predictor
  predictor = Predictor(export_dir)
  cols = _csv_columns(tmp_path)
  stale = predictor.predict_columns(cols)
  n = predictor.consume_incremental(pub.directory)
  assert n == 1
  fresh = predictor.predict_columns(cols)
  assert not np.allclose(stale['probs'], fresh['probs'])

  # parity: incremental-updated predictor == full re-export of the new
  # state (the serving-side contract)
  export2 = export_saved_model(trainer, state,
                               os.path.join(str(tmp_path), 'export2'))
  full = Predictor(export2).predict_columns(cols)
  np.testing.assert_allclose(np.asarray(fresh['probs']),
                             np.asarray(full['probs']), rtol=1e-5,
                             atol=1e-5)
  # idempotent: consuming again applies nothing
  assert predictor.consume_incremental(pub.directory) == 0


def _csv_columns(tmp_path, n=64):
  import csv
  cols = {'d1': [], 'd2': [], 'c1': [], 'c2': [], 'c3': []}
  with open(os.path.join(str(tmp_path), 'eval.csv')) as f:
    for i, row in enumerate(csv.reader(f)):
      if i >= n:
        break
      _, d1, d2, c1, c2, c3 = row
      cols['d1'].append(float(d1))
      cols['d2'].append(float(d2))
      cols['c1'].append(c1)
      cols['c2'].append(c2)
      cols['c3'].append(c3)
  return {k: np.asarray(v) for k, v in cols.items()}


def test_incremental_step_gating_and_partial_blob(tmp_path):
  """Consumer semantics (code-review regression): updates stamped at or
  before the export's global_step are skipped; a half-written update
  stops the sweep without being consumed and retries after the writer
  finishes."""
  import shutil
  from easyrec_tpu.export.predictor import Predictor
  from easyrec_tpu.export.saved_model import export_saved_model
  from easyrec_tpu.train.incremental import IncrementalPublisher

  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=20)
  cfg = get_configs_from_pipeline_file(cfg_path)
  cfg.train_config.incr_save_config.fs.incr_save_dir = 'incr_save'
  cfg.train_config.incr_save_config.sparse_save_steps = 5
  trainer = Trainer(cfg)
  train_iter = iter(trainer.train_input())
  first = next(train_iter)
  state = trainer.init_state(first)
  sharded = trainer.rules.shard_batch(first)
  for _ in range(10):
    state, _ = trainer.train_step(state, sharded)
  # export at step 10
  export_dir = export_saved_model(trainer, state,
                                  os.path.join(str(tmp_path), 'exp'))

  pub = IncrementalPublisher(cfg.train_config.incr_save_config,
                             cfg.model_dir)
  pub.publish(state, 0)                        # base snapshot
  s_old = state.replace(
      tables={k: v + 1.0 for k, v in state.tables.items()})
  old_path = pub.publish(s_old, 5)             # BEFORE the export
  for _ in range(3):
    state, _ = trainer.train_step(state, sharded)
  new_path = pub.publish(state, 13)            # after the export

  p = Predictor(export_dir)
  # corrupt the new update to simulate a half-written file
  good = new_path + '.bak'
  shutil.copy(new_path, good)
  with open(new_path, 'r+b') as f:
    f.truncate(100)
  n = p.consume_incremental(pub.directory)
  assert n == 0                                # old gated, new unreadable
  assert old_path in p._consumed               # gated = consumed
  assert new_path not in p._consumed
  # writer finishes: the update applies on the next poll
  shutil.copy(good, new_path)
  n = p.consume_incremental(pub.directory)
  assert n == 1
  assert new_path in p._consumed
