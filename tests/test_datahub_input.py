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
