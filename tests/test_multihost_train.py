"""Multi-host distributed TRAINING: 2 CPU processes x 4 virtual devices
run real train steps (process-local batch assembly via
make_array_from_process_local_data, owner-routed a2a sparse updates,
process-sharded input) and the loss decreases; checkpoints save from
process 0 and restore (reference test_utils.py:533-582 multi-process
PS/worker train analog)."""

import json
import os
import socket
import subprocess
import sys

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

cfg = get_configs_from_pipeline_file(os.path.join(tmp, 'pipeline.config'))
trainer = Trainer(cfg)
result = trainer.fit()
hist = result['history']
out = {
    'pid': pid,
    'first_loss': hist[0]['loss'],
    'last_loss': hist[-1]['loss'],
    'auc': float(result['eval_metrics']['auc']),
    'step': int(result['global_step']),
}
with open(os.path.join(tmp, 'train_mp_%d.json' % pid), 'w') as f:
  json.dump(out, f)
'''


def _free_port():
  s = socket.socket()
  s.bind(('127.0.0.1', 0))
  port = s.getsockname()[1]
  s.close()
  return port


def test_two_process_train_learns(tmp_path):
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=120,
                                     batch_size=128)
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  env['JAX_PLATFORMS'] = 'cpu'
  env['PYTHONPATH'] = os.pathsep.join(
      [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))] +
      env.get('PYTHONPATH', '').split(os.pathsep))
  script = str(tmp_path / 'worker.py')
  with open(script, 'w') as f:
    f.write(WORKER)
  port = str(_free_port())
  procs = [subprocess.Popen(
      [sys.executable, script, str(tmp_path), str(i), port],
      env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
      for i in range(2)]
  outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
  for p, out in zip(procs, outs):
    assert p.returncode == 0, out[-4000:]

  results = []
  for i in range(2):
    with open(tmp_path / ('train_mp_%d.json' % i)) as f:
      results.append(json.load(f))
  # both processes ran the same global program to the same step
  assert results[0]['step'] == results[1]['step'] == 120
  # SPMD: metrics identical across processes
  assert abs(results[0]['auc'] - results[1]['auc']) < 1e-9
  # it actually learned the synthetic signal
  assert results[0]['last_loss'] < results[0]['first_loss']
  assert results[0]['auc'] > 0.75, results[0]
  # process 0 wrote checkpoints under model_dir
  ckpt_dir = os.path.join(str(tmp_path), 'ckpt', 'checkpoints')
  assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
