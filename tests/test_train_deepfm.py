"""End-to-end: DeepFM trains on synthetic CTR data and learns (AUC >> 0.5),
checkpoints round-trip, eval metrics flow."""

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.train.trainer import Trainer
from tests import fixtures


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
  tmp = tmp_path_factory.mktemp('deepfm')
  cfg_path = fixtures.write_pipeline(tmp, num_steps=150)
  cfg = get_configs_from_pipeline_file(cfg_path)
  trainer = Trainer(cfg)
  result = trainer.fit()
  return cfg, trainer, result


def test_loss_decreases(trained):
  _, _, result = trained
  hist = result['history']
  assert len(hist) >= 2
  assert hist[-1]['loss'] < hist[0]['loss']


def test_auc_learned(trained):
  _, _, result = trained
  auc = result['eval_metrics']['auc']
  assert auc > 0.75, 'DeepFM failed to learn synthetic signal: auc=%s' % auc


def test_checkpoint_restore(trained):
  cfg, trainer, result = trained
  from easyrec_tpu.train import checkpoints as ckpt_lib
  state = result['state']
  mgr = ckpt_lib.CheckpointManager(cfg.model_dir)
  restored = mgr.restore_latest(state)
  assert restored is not None
  np.testing.assert_allclose(
      np.asarray(restored.step), np.asarray(state.step))
  for key in state.tables:
    np.testing.assert_allclose(np.asarray(restored.tables[key]),
                               np.asarray(state.tables[key]), rtol=1e-6)
  # restored state evaluates identically
  m1 = trainer.evaluate(state, max_batches=2)
  m2 = trainer.evaluate(restored, max_batches=2)
  assert abs(m1['auc'] - m2['auc']) < 1e-6
