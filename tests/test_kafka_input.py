"""KafkaInput end-to-end: pure-Python wire-protocol consumer
(data/kafka_client.py) against the in-process mock broker
(tests/kafka_mock.py), through the full InputPipeline and a real
train run with offset checkpoint/resume.

Reference parity: input/kafka_input.py (CSV message values, static
partition assignment by task, DATA_OFFSET save/restore)."""

import json
import os

import numpy as np
import pytest

from tests.kafka_mock import MockBroker


@pytest.fixture()
def broker():
  b = MockBroker()
  b.start()
  yield b
  b.stop()


def test_kafka_topic_tool_roundtrip(broker, tmp_path):
  """tools/kafka_topic write+read roundtrip against the mock broker."""
  from easyrec_tpu.tools import kafka_topic
  servers = '127.0.0.1:%d' % broker.port
  broker.create_topic('t0', 1)
  src = tmp_path / 'in.csv'
  lines = ['h1,h2', 'a,1', 'b,2', 'c,3']
  src.write_text('\n'.join(lines) + '\n')
  with open(src) as f:
    n = kafka_topic.write_topic(servers, 't0', f, skip_header=True)
  assert n == 3
  got = [v.decode() for _, _, v in kafka_topic.read_topic(servers, 't0')]
  assert got == ['a,1', 'b,2', 'c,3']
  # max_messages truncates
  got2 = list(kafka_topic.read_topic(servers, 't0', max_messages=2))
  assert len(got2) == 2


def _fill(broker, topic='ctr', partitions=2, rows=512, seed=3):
  rng = np.random.default_rng(seed)
  broker.create_topic(topic, partitions)
  lines = []
  for i in range(rows):
    d1, d2 = rng.random(), rng.random()
    c1 = 'u%d' % rng.integers(0, 50)
    label = int(d1 + d2 > 1.0)
    line = '%d,%.6f,%.6f,%s,i%d,q%d' % (
        label, d1, d2, c1, rng.integers(0, 40), rng.integers(0, 30))
    broker.produce(topic, i % partitions, line.encode())
    lines.append(line)
  return lines


def test_client_round_trip(broker):
  from easyrec_tpu.data import kafka_client as kc
  _fill(broker, rows=100, partitions=3)
  c = kc.KafkaConsumer('127.0.0.1:%d' % broker.port)
  parts = c.partitions_for('ctr')
  assert parts == [0, 1, 2]
  earliest = c.offsets('ctr', parts, kc.EARLIEST)
  latest = c.offsets('ctr', parts, kc.LATEST)
  assert earliest == {0: 0, 1: 0, 2: 0}
  assert sum(latest.values()) == 100
  records, hwm = c.fetch('ctr', {p: 0 for p in parts})
  assert len(records) == 100
  assert hwm == latest
  # resume mid-stream
  records2, _ = c.fetch('ctr', {0: 10, 1: latest[1], 2: 0})
  got_p0 = [r for r in records2 if r[0] == 0]
  assert len(got_p0) == latest[0] - 10
  assert all(r[1] >= 10 for r in got_p0)
  c.close()


def test_record_batch_codec():
  from easyrec_tpu.data import kafka_client as kc
  recs = [(None, b'hello'), (b'k', b'world')]
  blob = kc.build_record_batch(7, recs)
  parsed = kc.parse_record_batches(blob)
  assert parsed == [(7, None, b'hello'), (8, b'k', b'world')]
  # truncated trailing batch tolerated
  assert kc.parse_record_batches(blob[:-5]) == []


def _kafka_config(tmp_path, server, topic='ctr'):
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from tests import fixtures
  path = fixtures.write_pipeline(tmp_path, num_steps=3, batch_size=64,
                                 n_train=8, n_eval=8)
  cfg = get_configs_from_pipeline_file(path)
  cfg.ClearField('train_path')
  cfg.kafka_train_input.server = server
  cfg.kafka_train_input.topic = topic
  cfg.ClearField('eval_path')
  cfg.kafka_eval_input.server = server
  cfg.kafka_eval_input.topic = topic
  cfg.data_config.input_type = \
      cfg.data_config.InputType.Value('KafkaInput')
  cfg.data_config.ClearField('shuffle')
  cfg.data_config.num_epochs = 1
  cfg.train_config.num_steps = 3
  cfg.data_config.batch_size = 64
  return cfg


def test_kafka_pipeline_batches(broker, tmp_path, monkeypatch):
  monkeypatch.setenv('EASYREC_KAFKA_STOP_AT_END', '1')
  lines = _fill(broker, rows=300)
  cfg = _kafka_config(tmp_path, '127.0.0.1:%d' % broker.port)
  from easyrec_tpu.data.input_pipeline import InputPipeline
  pipe = InputPipeline(cfg.data_config, list(cfg.feature_configs),
                       cfg.kafka_train_input, mode='train')
  batches = list(pipe)
  rows = int(sum(b['sample_weight'].sum() for b in batches))
  assert rows == len(lines)
  assert pipe.reader.current_offsets == {0: 150, 1: 150}


def test_kafka_train_offset_resume(broker, tmp_path, monkeypatch):
  """Train 3 steps off the mock broker, checkpoint, then resume: the
  second run restores partition offsets from data_offset.json instead
  of re-reading from the start."""
  monkeypatch.setenv('EASYREC_KAFKA_STOP_AT_END', '1')
  _fill(broker, rows=1024)
  cfg = _kafka_config(tmp_path, '127.0.0.1:%d' % broker.port)
  from easyrec_tpu.train.trainer import Trainer
  t1 = Trainer(cfg)
  r1 = t1.fit(eval_at_end=False)
  assert r1['global_step'] == 3
  off_file = os.path.join(cfg.model_dir, 'data_offset.json')
  with open(off_file) as f:
    saved = json.load(f)
  assert saved['step'] == 3
  consumed = sum(saved['offsets'].values())
  assert consumed == 3 * 64

  t2 = Trainer(cfg)
  r2 = t2.fit(num_steps=6, eval_at_end=False)
  assert r2['global_step'] == 6
  with open(off_file) as f:
    saved2 = json.load(f)
  assert sum(saved2['offsets'].values()) == 6 * 64


def test_kafka_incremental_channel(broker, tmp_path):
  """IncrementSaveConfig.kafka: updates publish as messages via the
  wire-protocol producer; a Predictor drains + applies them and matches
  a full re-export (reference kafka channel,
  estimator_utils.py:484-599)."""
  import os as _os

  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.export.predictor import Predictor
  from easyrec_tpu.export.saved_model import export_saved_model
  from easyrec_tpu.train.incremental import IncrementalPublisher
  from easyrec_tpu.train.trainer import Trainer
  from tests import fixtures
  from tests.test_restore_incremental import _csv_columns

  server = '127.0.0.1:%d' % broker.port
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=40))
  cfg.train_config.incr_save_config.kafka.server = server
  cfg.train_config.incr_save_config.kafka.topic = 'incr_updates'
  trainer = Trainer(cfg)

  train_iter = iter(trainer.train_input())
  first = next(train_iter)
  state = trainer.init_state(first)
  export_dir = export_saved_model(trainer, state,
                                  _os.path.join(str(tmp_path), 'export'))

  pub = IncrementalPublisher(cfg.train_config.incr_save_config,
                             cfg.model_dir)
  assert pub.publish(state, 0) is None         # first = snapshot
  sharded = trainer.rules.shard_batch(first)
  for _ in range(5):
    state, _ = trainer.train_step(state, sharded)
  assert pub.publish(state, 5) == 'incr_updates@0'
  for _ in range(5):
    state, _ = trainer.train_step(state, sharded)
  assert pub.publish(state, 10) == 'incr_updates@1'

  predictor = Predictor(export_dir)
  cols = _csv_columns(tmp_path)
  stale = predictor.predict_columns(cols)
  assert predictor.consume_incremental_kafka(server, 'incr_updates') == 2
  fresh = predictor.predict_columns(cols)
  assert not np.allclose(stale['probs'], fresh['probs'])

  # serving contract: kafka-updated predictor == full re-export
  export2 = export_saved_model(trainer, state,
                               _os.path.join(str(tmp_path), 'export2'))
  full = Predictor(export2).predict_columns(cols)
  np.testing.assert_allclose(np.asarray(fresh['probs']),
                             np.asarray(full['probs']), rtol=1e-5,
                             atol=1e-5)
  # the consumer offset persists: nothing new to apply
  assert predictor.consume_incremental_kafka(server, 'incr_updates') == 0
