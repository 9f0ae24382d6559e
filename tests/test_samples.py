"""Every sample config parses, passes pre-check (config side) and builds
its full training program (model + layout + jitted step construction)."""

import glob
import os

import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.tools.pre_check import check_config

SAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), '..', 'samples', '*.config')))


@pytest.mark.parametrize('path', SAMPLES,
                         ids=[os.path.basename(p) for p in SAMPLES])
def test_sample_builds(path):
  cfg = get_configs_from_pipeline_file(path)
  problems = check_config(cfg)
  assert problems == [], problems

  # build the full program on a synthetic batch: one train step executes
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.synthetic import synthetic_batch
  cfg.model_dir = ''                       # no checkpointing
  cfg.train_config.num_steps = 1
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs, list(cfg.data_config.label_fields),
                          16, seed=1)
  # sampled-negative samples need neg views; skip execution, just specs
  if cfg.data_config.WhichOneof('sampler'):
    return
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  state, loss = trainer.train_step(state, sharded)
  assert np.isfinite(float(loss['total_loss']))
