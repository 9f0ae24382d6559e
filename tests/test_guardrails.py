"""Failure-mode guardrails (VERDICT r3 next-step 10): capacity-bounded
exchange overflow must ABORT loudly past a configurable rate, and the
in-memory negative-sampler item graph must refuse tables beyond the
host-memory bound with remediation text (the reference runs GraphLearn
as a cluster service for such graphs — core/sampler.py:99-180)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_str
from easyrec_tpu.train.trainer import Trainer

_CFG = '''
model_dir: ""
train_config {
  log_step_count_steps: 1
  optimizer_config {
    adam_optimizer {
      learning_rate { constant_learning_rate { learning_rate: 0.01 } }
    }
  }
  num_steps: 12
  overflow_abort_rate: 0.01
  overflow_abort_windows: 2
}
data_config {
  batch_size: 16
  label_fields: "label"
  input_fields { input_name: "label" input_type: FLOAT }
  input_fields { input_name: "c1" input_type: STRING }
  input_type: DummyInput
}
feature_config {
  features { input_names: "c1" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 64 }
}
model_config {
  model_class: "DeepFM"
  feature_groups { group_name: "deep" feature_names: "c1"
                   wide_deep: DEEP }
  feature_groups { group_name: "wide" feature_names: "c1"
                   wide_deep: WIDE }
  deepfm { dnn { hidden_units: [8] use_bn: false }
           final_dnn { hidden_units: [4] use_bn: false } }
}
'''


def test_exchange_overflow_abort():
  """Sustained overflow above train_config.overflow_abort_rate for
  overflow_abort_windows logging windows raises a pointed error."""
  cfg = get_configs_from_pipeline_str(_CFG)
  trainer = Trainer(cfg)
  real = trainer.train_step

  def leaky(state, batch):
    state2, loss = real(state, batch)
    loss = dict(loss)
    loss['exchange_pull_overflow'] = jnp.float32(1e6)   # 100% dropped
    return state2, loss

  trainer._train_step = leaky
  with pytest.raises(RuntimeError, match='EASYREC_EXCHANGE_CAP_FACTOR'):
    trainer.fit(checkpoint=False, eval_at_end=False)


def test_exchange_overflow_abort_disabled():
  """overflow_abort_rate: 0 accepts the drops (metric-only mode)."""
  cfg = get_configs_from_pipeline_str(_CFG)
  cfg.train_config.overflow_abort_rate = 0.0
  trainer = Trainer(cfg)
  real = trainer.train_step

  def leaky(state, batch):
    state2, loss = real(state, batch)
    loss = dict(loss)
    loss['exchange_pull_overflow'] = jnp.float32(1e6)
    return state2, loss

  trainer._train_step = leaky
  result = trainer.fit(checkpoint=False, eval_at_end=False)
  assert result['global_step'] == 12


def test_transient_overflow_does_not_abort():
  """A single over-threshold window resets when the next is clean."""
  cfg = get_configs_from_pipeline_str(_CFG)
  trainer = Trainer(cfg)
  real = trainer.train_step
  calls = [0]

  def spiky(state, batch):
    state2, loss = real(state, batch)
    loss = dict(loss)
    calls[0] += 1
    # overflow on every other step — never 2 consecutive windows
    if calls[0] % 2:
      loss['exchange_pull_overflow'] = jnp.float32(1e6)
    return state2, loss

  trainer._train_step = spiky
  result = trainer.fit(checkpoint=False, eval_at_end=False)
  assert result['global_step'] == 12


def test_sampler_table_size_guard(tmp_path, monkeypatch):
  from easyrec_tpu.data import samplers

  path = os.path.join(str(tmp_path), 'items.txt')
  with open(path, 'w') as f:
    f.write('id:int64\tweight:float\tattrs:string\n')
    for i in range(200):
      f.write('%d\t1.0\ti%d:c%d\n' % (i, i, i % 7))
  monkeypatch.setenv('EASYREC_SAMPLER_MAX_GB', '0.000001')  # ~1 KB
  with pytest.raises(MemoryError, match='EASYREC_SAMPLER_MAX_GB'):
    samplers._load_table(path, 3)
  monkeypatch.delenv('EASYREC_SAMPLER_MAX_GB')
  rows = samplers._load_table(path, 3)
  assert len(rows) == 200


def test_eval_reports_exchange_overflow_rate():
  """evaluate() surfaces the EP-exchange drop rate in its metric dict
  (and therefore eval_result.txt): drops within the train guardrail's
  tolerance must not stay invisible (VERDICT r4 weak #8)."""
  cfg = get_configs_from_pipeline_str(_CFG)
  trainer = Trainer(cfg)
  from easyrec_tpu.utils.synthetic import synthetic_batch
  batch = synthetic_batch(trainer.specs, ['label'], 16, seed=0)
  state = trainer.init_state(batch)
  metrics = trainer.evaluate(state, max_batches=2)
  assert 'exchange_overflow_rate' in metrics, sorted(metrics)
  assert 0.0 <= metrics['exchange_overflow_rate'] <= 1.0
