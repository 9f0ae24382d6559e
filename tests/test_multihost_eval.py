"""Multi-host distributed evaluation: 2 CPU processes x 4 virtual devices
evaluate process-sharded eval data; device metrics (AUC) and
process-gathered host metrics (GAUC) must match the single-process run on
the same state (reference main.py:524 distribute_evaluate +
core/easyrec_metrics/distribute_metrics_impl_tf.py)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests import fixtures

WORKER = r'''
import json, os, sys
tmp, pid, port = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address='127.0.0.1:' + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8
import numpy as np
from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.train.trainer import Trainer
from easyrec_tpu.utils.synthetic import synthetic_batch

cfg = get_configs_from_pipeline_file(os.path.join(tmp, 'pipeline.config'))
trainer = Trainer(cfg)
batch = synthetic_batch(trainer.specs, list(cfg.data_config.label_fields),
                        16, seed=1)
state = trainer.init_state(batch)
metrics = trainer.evaluate(state)
if pid == 0:
  with open(os.path.join(tmp, 'metrics_mp.json'), 'w') as f:
    json.dump({k: float(v) for k, v in metrics.items()}, f)
'''


def _free_port():
  s = socket.socket()
  s.bind(('127.0.0.1', 0))
  port = s.getsockname()[1]
  s.close()
  return port


def test_two_process_eval_matches_single(tmp_path):
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=1, n_eval=1000)
  from easyrec_tpu.config import (get_configs_from_pipeline_file,
                                  save_pipeline_config)
  cfg = get_configs_from_pipeline_file(cfg_path)
  m = cfg.eval_config.metrics_set.add()
  m.gauc.uid_field = 'c1'
  save_pipeline_config(cfg, str(tmp_path), filename='pipeline.config')

  # single-process reference on this process's 8-device mesh
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.synthetic import synthetic_batch
  trainer = Trainer(cfg)
  batch = synthetic_batch(trainer.specs,
                          list(cfg.data_config.label_fields), 16, seed=1)
  state = trainer.init_state(batch)
  ref = trainer.evaluate(state)

  port = str(_free_port())
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  env['JAX_PLATFORMS'] = 'cpu'
  env['PYTHONPATH'] = os.pathsep.join(
      [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))] +
      env.get('PYTHONPATH', '').split(os.pathsep))
  script = str(tmp_path / 'worker.py')
  with open(script, 'w') as f:
    f.write(WORKER)
  procs = [subprocess.Popen(
      [sys.executable, script, str(tmp_path), str(i), port],
      env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
      for i in range(2)]
  outs = [p.communicate(timeout=900)[0].decode() for p in procs]
  for p, out in zip(procs, outs):
    assert p.returncode == 0, out[-4000:]

  with open(tmp_path / 'metrics_mp.json') as f:
    mp = json.load(f)
  # AUC streams through device histograms (batch-order independent);
  # GAUC is computed from the process-gathered host buffers
  assert abs(mp['auc'] - ref['auc']) < 2e-3, (mp, ref)
  assert abs(mp['gauc'] - ref['gauc']) < 2e-3, (mp, ref)
