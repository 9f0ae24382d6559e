"""Big-model export (export/big_model.py): embeddings stripped into a
file-backed KV store, served memory-bounded via memmap gathers; exact
parity with the in-memory export; incremental deltas write through."""

import os

import numpy as np

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.export.predictor import Predictor
from easyrec_tpu.export.saved_model import export_saved_model
from easyrec_tpu.train.trainer import Trainer
from tests import fixtures


def test_big_model_parity_and_incremental(tmp_path):
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=60)
  cfg = get_configs_from_pipeline_file(cfg_path)
  trainer = Trainer(cfg)
  result = trainer.fit(checkpoint=False)
  state = result['state']

  normal_dir = export_saved_model(trainer, state,
                                  str(tmp_path / 'export_normal'))
  big_dir = export_saved_model(trainer, state,
                               str(tmp_path / 'export_big'),
                               big_model=True)

  # the big export's variables bundle carries NO tables; the kv store
  # holds them as raw bins
  assert os.path.isdir(os.path.join(big_dir, 'kv'))
  from easyrec_tpu.export import big_model as bm
  stores = bm.open_kv_store(big_dir)
  for key, t in trainer.layout.tables.items():
    assert stores[key].dim == t.dim

  # serving parity: identical outputs from both exports
  rows = []
  with open(tmp_path / 'eval.csv') as f:
    for i, line in enumerate(f):
      if i >= 256:
        break
      _, d1, d2, c1, c2, c3 = line.strip().split(',')
      rows.append({'d1': d1, 'd2': d2, 'c1': c1, 'c2': c2, 'c3': c3})
  p_norm = Predictor(normal_dir, batch_size=256)
  p_big = Predictor(big_dir, batch_size=256)
  out_n = p_norm.predict(rows)
  out_b = p_big.predict(rows)
  pn = np.asarray([r['probs'] for r in out_n], np.float32)
  pb = np.asarray([r['probs'] for r in out_b], np.float32)
  np.testing.assert_allclose(pb, pn, rtol=0, atol=1e-6)

  # incremental write-through: publish one update, consume, outputs move
  from easyrec_tpu.train.incremental import IncrementalPublisher
  from easyrec_tpu.protos.train_pb2 import IncrementSaveConfig
  ic = IncrementSaveConfig()
  ic.fs.incr_save_dir = 'incr'
  ic.fs.relative = True
  pub = IncrementalPublisher(ic, str(tmp_path / 'pub'),
                             pack_metas=trainer.pack_metas)
  export_step = int(np.asarray(state.step))
  pub.publish(state, export_step)            # base snapshot
  # perturb the tables and publish the delta STAMPED AFTER the export
  # (older-stamped updates are correctly skipped by the consumer)
  state2 = state.replace(
      tables={k: v + 0.05 for k, v in state.tables.items()})
  path = pub.publish(state2, export_step + 1)
  assert path is not None
  n = p_big.consume_incremental(str(tmp_path / 'pub' / 'incr'))
  assert n == 1
  out_b2 = p_big.predict(rows)
  pb2 = np.asarray([r['probs'] for r in out_b2], np.float32)
  assert not np.allclose(pb2, pb, atol=1e-6), \
      'big-model predictions should change after the delta'


class _FakeRedis:
  """mget/mset/get/set duck-type of redis-py — validates the wire
  contract (key layout + byte encoding) without a reachable broker."""

  def __init__(self):
    self.kv = {}

  def mget(self, names):
    return [self.kv.get(n) for n in names]

  def mset(self, mapping):
    self.kv.update(mapping)

  def set(self, name, value):
    self.kv[name] = value

  def get(self, name):
    return self.kv.get(name)


def test_redis_transport_roundtrip():
  """KVTransport interface: the redis backend (fake client) serves the
  same gathers/updates as the file backend (reference
  export_big_model.py:43 redis kv_module)."""
  import numpy as np
  from easyrec_tpu.export import big_model as bm

  rng = np.random.default_rng(0)
  tables = {'emb16': rng.normal(size=(64, 16)).astype(np.float32),
            'wide': rng.normal(size=(32, 1)).astype(np.float32)}
  fake = _FakeRedis()
  bm.write_kv_store('/nonexistent', tables, uri='redis://test:6379',
                    client=fake)
  stores = bm.open_kv_store('/nonexistent', uri='redis://test:6379',
                            client=fake)
  ids = np.array([[3, 7], [63, 0]])
  np.testing.assert_allclose(stores['emb16'].gather(ids),
                             tables['emb16'][ids], rtol=0)
  # write-through delta then re-gather
  new = np.full((2, 16), 5.0, np.float32)
  stores['emb16'].update_rows(np.array([3, 7]), new)
  got = stores['emb16'].gather(np.array([3, 7]))
  np.testing.assert_allclose(got, new)
  # key layout is the reference's '<ns>:<table>:<row>'
  assert 'easyrec:emb16:3' in fake.kv
  # missing rows gather zeros (cold-start parity with reference kv)
  cold = bm.RedisKVTable(fake, 'easyrec', 'emb16',
                         {'rows': 64, 'dim': 16})
  fake2 = _FakeRedis()
  cold2 = bm.RedisKVTable(fake2, 'easyrec', 'emb16',
                          {'rows': 64, 'dim': 16})
  assert float(np.abs(cold2.gather(np.array([1]))).sum()) == 0.0


def test_unknown_transport_uri_pointed():
  import pytest
  from easyrec_tpu.export import big_model as bm
  with pytest.raises(ValueError, match='unknown KV transport'):
    bm.make_transport('/tmp', 'oss://bucket/x')
