"""DataHubInput end-to-end: REST client (data/datahub_client.py)
against the in-process mock service (tests/datahub_mock.py), through
the full InputPipeline and a real train run with sequence
checkpoint/resume.

Reference parity: input/datahub_input.py (TUPLE records, shard
assignment i % task_num, offset_info restore)."""

import json
import os

import numpy as np
import pytest

from tests.datahub_mock import MockDataHub

SCHEMA = [('label', 'BIGINT'), ('d1', 'DOUBLE'), ('d2', 'DOUBLE'),
          ('c1', 'STRING'), ('c2', 'STRING'), ('c3', 'STRING')]


@pytest.fixture()
def dh():
  d = MockDataHub()
  d.start()
  yield d
  d.stop()


def _fill(dh, project='p', topic='ctr', shards=2, rows=512, seed=3):
  rng = np.random.default_rng(seed)
  dh.create_topic(project, topic, SCHEMA, shards)
  for i in range(rows):
    d1, d2 = rng.random(), rng.random()
    label = int(d1 + d2 > 1.0)
    dh.put(project, topic, i % shards,
           [label, '%.6f' % d1, '%.6f' % d2,
            'u%d' % rng.integers(0, 50), 'i%d' % rng.integers(0, 40),
            'q%d' % rng.integers(0, 30)])
  return rows


def test_client_round_trip(dh):
  from easyrec_tpu.data import datahub_client as dhc
  _fill(dh, rows=100, shards=3)
  c = dhc.DataHubClient('127.0.0.1:%d' % dh.port, 'ak', 'sk')
  assert c.list_shards('p', 'ctr') == ['0', '1', '2']
  assert [n for n, _ in c.get_topic('p', 'ctr')] == \
      [n for n, _ in SCHEMA]
  cur, seq = c.get_cursor('p', 'ctr', '0', dhc.OLDEST)
  assert seq == 0
  _, latest = c.get_cursor('p', 'ctr', '0', dhc.LATEST)
  assert latest == 34                          # 100 rows over 3 shards
  recs, nxt = c.get_records('p', 'ctr', '0', cur, limit=10)
  assert len(recs) == 10 and recs[0][0] == 0 and recs[-1][0] == 9
  recs2, _ = c.get_records('p', 'ctr', '0', nxt, limit=1000)
  assert len(recs2) == 24 and recs2[0][0] == 10
  # resume mid-stream by sequence
  cur5, _ = c.get_cursor('p', 'ctr', '0', dhc.SEQUENCE, sequence=5)
  recs3, _ = c.get_records('p', 'ctr', '0', cur5, limit=3)
  assert [r[0] for r in recs3] == [5, 6, 7]
  c.close()


def _dh_config(tmp_path, dh, topic='ctr'):
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from tests import fixtures
  path = fixtures.write_pipeline(tmp_path, num_steps=3, batch_size=64,
                                 n_train=8, n_eval=8)
  cfg = get_configs_from_pipeline_file(path)
  for which, field in (('train_path', 'datahub_train_input'),
                       ('eval_path', 'datahub_eval_input')):
    cfg.ClearField(which)
    c = getattr(cfg, field)
    c.akId, c.akSecret = 'ak', 'sk'
    c.region = '127.0.0.1:%d' % dh.port
    c.project, c.topic = 'p', topic
  cfg.data_config.input_type = \
      cfg.data_config.InputType.Value('DataHubInput')
  cfg.data_config.ClearField('shuffle')
  cfg.data_config.num_epochs = 1
  cfg.data_config.batch_size = 64
  return cfg


def test_datahub_pipeline_batches(dh, tmp_path, monkeypatch):
  monkeypatch.setenv('EASYREC_DATAHUB_STOP_AT_END', '1')
  rows = _fill(dh, rows=300)
  cfg = _dh_config(tmp_path, dh)
  from easyrec_tpu.data.input_pipeline import InputPipeline
  pipe = InputPipeline(cfg.data_config, list(cfg.feature_configs),
                       cfg.datahub_train_input, mode='train')
  batches = list(pipe)
  got = int(sum(b['sample_weight'].sum() for b in batches))
  assert got == rows
  assert pipe.reader.current_offsets == {0: 150, 1: 150}


def test_datahub_train_offset_resume(dh, tmp_path, monkeypatch):
  """Train 3 steps off the mock service, checkpoint, then resume: the
  second run restores shard sequences from data_offset.json instead of
  re-reading from OLDEST."""
  monkeypatch.setenv('EASYREC_DATAHUB_STOP_AT_END', '1')
  _fill(dh, rows=1024)
  cfg = _dh_config(tmp_path, dh)
  from easyrec_tpu.train.trainer import Trainer
  t1 = Trainer(cfg)
  r1 = t1.fit(eval_at_end=False)
  assert r1['global_step'] == 3
  off_file = os.path.join(cfg.model_dir, 'data_offset.json')
  with open(off_file) as f:
    saved = json.load(f)
  assert saved['step'] == 3
  assert sum(saved['offsets'].values()) == 3 * 64

  t2 = Trainer(cfg)
  r2 = t2.fit(num_steps=6, eval_at_end=False)
  assert r2['global_step'] == 6
  with open(off_file) as f:
    saved2 = json.load(f)
  assert sum(saved2['offsets'].values()) == 6 * 64


def test_datahub_incremental_channel(tmp_path):
  """IncrementSaveConfig.datahub: updates publish as base64-chunked
  TUPLE records through the REST client's produce side; a Predictor
  drains + applies them and matches a full re-export (reference DataHub
  channel, estimator_utils.py:357-466)."""
  import os as _os

  import numpy as np

  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.export.predictor import Predictor
  from easyrec_tpu.export.saved_model import export_saved_model
  from easyrec_tpu.train.incremental import IncrementalPublisher
  from easyrec_tpu.train.trainer import Trainer
  from tests import fixtures
  from tests.datahub_mock import MockDataHub
  from tests.test_restore_incremental import _csv_columns

  dh = MockDataHub()
  dh.create_topic('p', 'incr', [('key', 'STRING'), ('part', 'STRING'),
                                ('total', 'STRING'),
                                ('payload', 'STRING')], shards=1)
  endpoint = dh.start()
  try:
    cfg = get_configs_from_pipeline_file(
        fixtures.write_pipeline(tmp_path, num_steps=40))
    incr = cfg.train_config.incr_save_config.datahub
    incr.region = endpoint
    incr.akId, incr.akSecret = 'ak', 'sk'
    incr.project, incr.topic = 'p', 'incr'
    trainer = Trainer(cfg)

    train_iter = iter(trainer.train_input())
    first = next(train_iter)
    state = trainer.init_state(first)
    export_dir = export_saved_model(trainer, state,
                                    _os.path.join(str(tmp_path), 'export'))

    pub = IncrementalPublisher(cfg.train_config.incr_save_config,
                               cfg.model_dir)
    assert pub.publish(state, 0) is None       # first = snapshot
    sharded = trainer.rules.shard_batch(first)
    for _ in range(5):
      state, _ = trainer.train_step(state, sharded)
    ref = pub.publish(state, 5)
    assert ref == 'p/incr:update-000001-step-5'
    for _ in range(5):
      state, _ = trainer.train_step(state, sharded)
    pub.publish(state, 10)

    predictor = Predictor(export_dir)
    cols = _csv_columns(tmp_path)
    stale = predictor.predict_columns(cols)
    n = predictor.consume_incremental_datahub(endpoint, 'ak', 'sk',
                                              'p', 'incr')
    assert n == 2
    fresh = predictor.predict_columns(cols)
    assert not np.allclose(stale['probs'], fresh['probs'])

    # parity vs a full re-export of the final state
    export2 = export_saved_model(trainer, state,
                                 _os.path.join(str(tmp_path), 'export2'))
    full = Predictor(export2).predict_columns(cols)
    np.testing.assert_allclose(np.asarray(fresh['probs']),
                               np.asarray(full['probs']),
                               rtol=1e-5, atol=1e-5)
    # idempotent: the persisted sequence skips consumed records
    assert predictor.consume_incremental_datahub(endpoint, 'ak', 'sk',
                                                 'p', 'incr') == 0
  finally:
    dh.stop()
