"""Incremental model updates for online serving.

Reference: the incr-save hook publishes dense-variable deltas plus the
sparse rows touched since the last save to Kafka / FS / DataHub
(easy_rec/python/utils/estimator_utils.py:357-599, incr_record.so taps).

TPU-native design: instead of per-step device->host id taps (which would
force a host sync every step), the publisher keeps the last published
snapshot on host and diffs at publish time — the serving-side contract
(only changed rows travel) is identical, with zero train-step overhead.
Channels: File (directory of .npz updates + meta json) and Kafka (the
same .npz blobs as single messages on a 1-partition topic, key
`update_<version>_step_<step>`, via the built-in wire-protocol producer
`data/kafka_client.py` — the reference sends dense/sparse delta blobs
keyed `dense_update_<step>`/`sparse_update_<step>` the same way,
estimator_utils.py:484-599). DataHub publishes the same blobs as
base64-chunked TUPLE records (key, part, total, payload) through the
built-in REST client `data/datahub_client.py` (reference publishes to
DataHub at estimator_utils.py:357-466).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


def _flatten_params(tree) -> Dict[str, np.ndarray]:
  out = {}
  for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
    keys = [str(p.key) for p in path if hasattr(p, 'key')]
    out['/'.join(keys)] = np.asarray(leaf)
  return out


class IncrementalPublisher:
  """Publishes dense deltas + touched sparse rows after checkpoint saves."""

  def __init__(self, incr_save_config, model_dir: str, pack_metas=None):
    self.config = incr_save_config
    # packed training still publishes LOGICAL [rows, dim] deltas so the
    # serving side stays layout-independent
    self.pack_metas = pack_metas
    which = incr_save_config.WhichOneof('incr_update')
    self.directory = None
    self._producer = None
    self._datahub = None
    if which == 'datahub':
      from easyrec_tpu.data import datahub_client as dhc
      dh = incr_save_config.datahub
      self._datahub = dhc.DataHubClient(dh.region, dh.akId, dh.akSecret)
      self._dh_project, self._dh_topic = dh.project, dh.topic
    elif which == 'kafka':
      from easyrec_tpu.data import kafka_client as kc
      self._producer = kc.KafkaProducer(incr_save_config.kafka.server)
      self._topic = incr_save_config.kafka.topic
    else:
      fs = incr_save_config.fs
      sub = fs.incr_save_dir or 'incr_save'
      self.directory = os.path.join(model_dir, sub) if fs.relative else sub
      os.makedirs(self.directory, exist_ok=True)
    self._last_dense: Optional[Dict[str, np.ndarray]] = None
    self._last_tables: Dict[str, np.ndarray] = {}
    self._version = 0

  def publish(self, state, step: int) -> Optional[str]:
    """Write one update file; returns its path (None on first snapshot)."""
    dense = _flatten_params(state.params)
    tables = {k: np.asarray(v) for k, v in state.tables.items()}
    if self.pack_metas:
      from easyrec_tpu.ops import packed_table as pt
      tables = {k: pt.unpack_host(v, self.pack_metas[k])[0]
                for k, v in tables.items()}
    first = self._last_dense is None
    payload = {}
    meta = {'step': int(step), 'version': self._version,
            'ts': time.time(), 'dense': [], 'sparse': {}}
    if not first:
      for name, arr in dense.items():
        if not np.array_equal(arr, self._last_dense.get(name)):
          payload['dense/%s' % name] = arr
          meta['dense'].append(name)
      for key, table in tables.items():
        old = self._last_tables.get(key)
        if old is None or old.shape != table.shape:
          changed = np.arange(table.shape[0])
        else:
          changed = np.nonzero(np.any(table != old, axis=1))[0]
        if changed.size:
          payload['sparse_ids/%s' % key] = changed.astype(np.int64)
          payload['sparse_vals/%s' % key] = table[changed]
          meta['sparse'][key] = int(changed.size)
    self._last_dense = dense
    self._last_tables = tables
    if first:
      logging.info('incremental publisher: snapshot at step %d', step)
      return None
    self._version += 1
    name = 'update-%06d-step-%d' % (self._version, step)
    if self._datahub is not None:
      import base64
      import io
      buf = io.BytesIO()
      np.savez_compressed(buf, __meta__=np.array(json.dumps(meta)),
                          **payload)
      blob = base64.b64encode(buf.getvalue()).decode()
      # chunk under DataHub's per-record size cap; TUPLE rows are
      # (key, part, total, payload)
      chunk = 512 * 1024
      parts = [blob[i:i + chunk] for i in range(0, len(blob), chunk)] \
          or ['']
      rows = [[name, str(i), str(len(parts)), p]
              for i, p in enumerate(parts)]
      shards = self._datahub.list_shards(self._dh_project, self._dh_topic)
      self._datahub.put_records(self._dh_project, self._dh_topic,
                                shards[0], rows)
      logging.info('published incremental update %s to datahub %s/%s: '
                   '%d dense vars, %s sparse rows, %d record(s)',
                   name, self._dh_project, self._dh_topic,
                   len(meta['dense']), dict(meta['sparse']), len(rows))
      return '%s/%s:%s' % (self._dh_project, self._dh_topic, name)
    if self._producer is not None:
      import io
      buf = io.BytesIO()
      np.savez_compressed(buf, __meta__=np.array(json.dumps(meta)),
                          **payload)
      off = self._producer.send(self._topic, buf.getvalue(),
                                key=name.encode())
      logging.info('published incremental update %s to kafka %s@%d: '
                   '%d dense vars, %s sparse rows', name, self._topic,
                   off, len(meta['dense']), dict(meta['sparse']))
      return '%s@%d' % (self._topic, off)
    path = os.path.join(self.directory, name + '.npz')
    # atomic publish: consumers poll this directory — never let them see
    # a half-written npz
    tmp = os.path.join(self.directory, '.tmp-' + name + '.npz')
    with open(tmp, 'wb') as f:
      np.savez_compressed(f, **payload)
    os.replace(tmp, path)
    with open(path + '.meta', 'w') as f:
      json.dump(meta, f)
    logging.info('published incremental update %s: %d dense vars, %s '
                 'sparse rows', path, len(meta['dense']),
                 {k: v for k, v in meta['sparse'].items()})
    return path


def list_updates(directory: str):
  """Pending update files in version order."""
  if not os.path.isdir(directory):
    return []
  files = [f for f in os.listdir(directory)
           if f.startswith('update-') and f.endswith('.npz')]
  return [os.path.join(directory, f) for f in sorted(files)]


def apply_update(dense: Dict[str, np.ndarray],
                 tables: Dict[str, np.ndarray], update_path: str) -> None:
  """Apply one published update in place (serving side)."""
  with np.load(update_path) as data:
    for key in data.files:
      if key.startswith('dense/'):
        dense[key[len('dense/'):]] = data[key]
      elif key.startswith('sparse_ids/'):
        tname = key[len('sparse_ids/'):]
        ids = data[key]
        vals = data['sparse_vals/%s' % tname]
        tables[tname][ids] = vals
