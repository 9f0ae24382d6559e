"""EVParams semantics (features/ev.py): frequency-filtered admission +
TTL eviction on static hash tables (reference: PAI EmbeddingVariable,
protos/feature_config.proto EVParams)."""

import re

import numpy as np
import pytest

import jax.numpy as jnp

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.train.trainer import Trainer
from tests import fixtures


def _ev_pipeline(tmp_path, filter_freq, steps_to_live=0, num_steps=60,
                 **kw):
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=num_steps, **kw)
  text = open(cfg_path).read()
  # attach ev_params to every categorical feature
  ev = ('feature_type: IdFeature\n              embedding_dim: 8 '
        'hash_bucket_size: 200 ev_params { filter_freq: %d '
        'steps_to_live: %d } }' % (filter_freq, steps_to_live))
  text = re.sub(
      r'feature_type: IdFeature\n\s+embedding_dim: 8 hash_bucket_size: '
      r'200 }', ev, text)
  with open(cfg_path, 'w') as f:
    f.write(text)
  return cfg_path


def test_plan_and_state(tmp_path):
  cfg = get_configs_from_pipeline_file(
      _ev_pipeline(tmp_path, filter_freq=3, steps_to_live=100))
  trainer = Trainer(cfg)
  assert trainer.ev_plan is not None
  keys = [k for k, ev in trainer.ev_plan.items() if ev.enabled]
  assert keys, 'categorical tables should be EV-enabled'
  for k in keys:
    ev = trainer.ev_plan[k]
    assert ev.ttl == 100
    assert ev.thr_cols.max() == 3


def test_admission_blocks_learning(tmp_path):
  """With an unreachably high filter_freq nothing is admitted: the
  categorical embeddings stay zero and AUC collapses toward the
  dense-only signal; with filter_freq low, learning proceeds."""
  cfg = get_configs_from_pipeline_file(
      _ev_pipeline(tmp_path, filter_freq=10 ** 9, num_steps=80))
  t_blocked = Trainer(cfg)
  r_blocked = t_blocked.fit(checkpoint=False)
  state = r_blocked['state']
  # EV-gated member row ranges stay exactly zero (zero-init + masked
  # grads); non-EV members (raw d1/d2 embeddings) may train
  for key, ev in t_blocked.ev_plan.items():
    arr = np.asarray(state.tables[key])
    for start, end, ff, _ttl in ev.row_segments:
      if ff > 0:
        assert np.all(arr[start:end] == 0.0), \
            '%s[%d:%d] should be untouched' % (key, start, end)
  # counts accumulated anyway
  ev_keys = [k for k, ev in t_blocked.ev_plan.items() if ev.enabled]
  total = sum(float(jnp.sum(state.slots[k]['ev_count']))
              for k in ev_keys)
  assert total > 0

  cfg2 = get_configs_from_pipeline_file(
      _ev_pipeline(tmp_path, filter_freq=1, num_steps=80))
  t_open = Trainer(cfg2)
  r_open = t_open.fit(checkpoint=False)
  auc_open = r_open['eval_metrics']['auc']
  auc_blocked = r_blocked['eval_metrics']['auc']
  assert auc_open > auc_blocked + 0.03, (auc_open, auc_blocked)
  # admitted rows trained away from zero
  nz = sum(int(np.count_nonzero(np.asarray(tbl).sum(axis=-1)))
           for tbl in r_open['state'].tables.values())
  assert nz > 0


def test_ttl_eviction_sweep(tmp_path):
  from easyrec_tpu.features import ev as ev_lib
  cfg = get_configs_from_pipeline_file(
      _ev_pipeline(tmp_path, filter_freq=1, steps_to_live=5,
                   num_steps=40))
  trainer = Trainer(cfg)
  result = trainer.fit(checkpoint=False)
  state = result['state']
  # jump the clock far past the TTL: every trained row becomes stale
  state = state.replace(step=state.step + 10_000)
  swept = ev_lib.evict_stale(state, trainer.ev_plan, trainer.pack_metas,
                             trainer.ev_pack_metas, trainer.layout)
  for key, ev in trainer.ev_plan.items():
    if not ev.enabled or ev.ttl <= 0:
      continue
    before = np.asarray(state.tables[key])
    after = np.asarray(swept.tables[key])
    for start, end, _ff, lv in ev.row_segments:
      if lv > 0:   # TTL member: every stale row swept to zero
        assert np.all(after[start:end] == 0.0), (key, start, end)
      else:        # co-fused member without steps_to_live: untouched
        np.testing.assert_array_equal(after[start:end],
                                      before[start:end])
    # evicted ids must re-earn admission: counters reset in TTL segments
    aux = swept.slots[key]
    for start, end, _ff, lv in ev.row_segments:
      if lv <= 0:
        continue
      if 'ev_count' in aux:
        assert np.all(np.asarray(aux['ev_count'])[start:end] == 0.0)
      assert np.all(np.asarray(aux['ev_last'])[start:end] == 0.0)


def test_ev_packed_mode(tmp_path, monkeypatch):
  """Same admission semantics through the packed-table path."""
  monkeypatch.setenv('EASYREC_PACKED_TABLES', '1')
  cfg = get_configs_from_pipeline_file(
      _ev_pipeline(tmp_path, filter_freq=10 ** 9, num_steps=30))
  trainer = Trainer(cfg)
  assert trainer.packed_mode and trainer.ev_pack_metas
  result = trainer.fit(checkpoint=False)
  state = result['state']
  from easyrec_tpu.ops import packed_table as pt
  for key, ev in trainer.ev_plan.items():
    if not ev.enabled:
      continue
    w, _ = pt.unpack_host(np.asarray(state.tables[key]),
                          trainer.pack_metas[key])
    for start, end, ff, _ttl in ev.row_segments:
      if ff > 0:
        assert np.all(w[start:end] == 0.0)
    total = float(jnp.sum(state.slots[key]['ev_count']))
    assert total > 0
