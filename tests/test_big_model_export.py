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
