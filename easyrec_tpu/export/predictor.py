"""Predictor: load an export and serve batch / offline predictions.

Reference: easy_rec/python/inference/predictor.py:101-603 (PredictorImpl +
Predictor): loads a SavedModel, feeds CSV/table inputs through the same
feature pipeline used in training, writes outputs. Here the export carries
the pipeline config, so the host transforms are reconstructed exactly and
the forward pass is one jitted function.
"""

from __future__ import annotations

import csv as csv_lib
import json
import os
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from easyrec_tpu.data.input_pipeline import InputPipeline
from easyrec_tpu.export import saved_model as sm
from easyrec_tpu.features import feature_spec as fs
from easyrec_tpu.features import transforms as tr
from easyrec_tpu.models import base as model_base
from easyrec_tpu.models import zoo  # noqa: F401
from easyrec_tpu.ops import embedding as emb_ops
from easyrec_tpu.config import config_util


class Predictor:
  """Loads an easyrec_tpu export and predicts."""

  def __init__(self, export_dir: str, batch_size: int = 1024):
    self.export_dir = export_dir
    self.config, self.state = sm.load_serving_state(export_dir)
    with open(os.path.join(export_dir, sm.EXPORT_META)) as f:
      self.meta = json.load(f)
    self.batch_size = batch_size
    self.feature_configs = config_util.get_feature_configs(self.config)
    self.specs = fs.build_feature_specs(
        self.feature_configs,
        max_tag_len=self.config.data_config.max_tag_len or 16)
    self.transforms = tr.build_transforms(self.specs)
    self.ctx = model_base.build_context(self.config, self.specs)
    self.model = model_base.create_model(self.ctx)
    self.module = self.model.make_module()
    self._predict_fn = None

  @property
  def input_names(self) -> List[str]:
    names = []
    for fc in self.feature_configs:
      names.extend(fc.input_names)
    return list(dict.fromkeys(names))

  def _build_predict_fn(self):
    module, model, layout = self.module, self.model, self.ctx.layout
    params = self.state['params']
    batch_stats = self.state.get('batch_stats') or {}
    tables = self.state['tables']

    wanted = self.meta.get('outputs') if self.meta.get('tower') else None

    rtp = bool(self.meta.get('export_rtp_outputs'))

    def apply_fn(batch, pulled):
      variables = {'params': params}
      if batch_stats:
        variables['batch_stats'] = batch_stats
      outputs = module.apply(variables, batch, pulled, False)
      exported = model.export_outputs(outputs)
      if rtp and ('probs' in exported or 'y' in exported):
        # RTP serving output (reference rank_model.py:153-211): one
        # canonical 'rank_predict' tensor — probs for classification,
        # y for regression
        exported['rank_predict'] = exported.get('probs',
                                                exported.get('y'))
      if wanted:   # split-tower export: only this tower's outputs
        exported = {k: v for k, v in exported.items() if k in wanted}
      return exported

    if self.meta.get('big_model'):
      # memory-bounded serving: tables live in the file-backed KV store
      # (export/big_model.py); ids pack + row gather happen on host via
      # memmap, only the dense forward is jitted. Read-only mapping:
      # serving exports often sit on read-only volumes — only
      # consume_incremental needs (and opens) a writable mapping.
      from easyrec_tpu.export import big_model as bm
      stores = self._open_kv(writable=False)
      jitted = jax.jit(apply_fn)

      def fn(batch):
        host = {k: np.asarray(v) for k, v in batch.items()}
        packs = bm.pack_ids_np(layout, host)
        pulled = {key: stores[key].gather(ids)
                  for key, ids in packs.items()}
        return jitted(batch, pulled)

      return fn

    def fn(batch):
      packs = emb_ops.pack_ids(layout, batch)
      pulled = emb_ops.pull_embeddings(tables, packs)
      return apply_fn(batch, pulled)

    return jax.jit(fn)

  @property
  def predict_fn(self):
    if self._predict_fn is None:
      self._predict_fn = self._build_predict_fn()
    return self._predict_fn

  def _open_kv(self, writable: bool):
    """Open (or upgrade to writable) the big-model KV store."""
    from easyrec_tpu.export import big_model as bm
    if not hasattr(self, '_kv_stores') or \
        (writable and not self._kv_writable):
      self._kv_stores = bm.open_kv_store(self.export_dir,
                                         writable=writable)
      self._kv_writable = writable
    return self._kv_stores

  def consume_incremental(self, incr_dir: str) -> int:
    """Apply pending incremental updates published by training
    (IncrementSaveConfig fs channel; reference: the EAS processor
    consuming kafka/fs deltas). Returns the number applied."""
    from easyrec_tpu.train import incremental as incr_lib
    if not hasattr(self, '_consumed'):
      self._consumed = set()
    pending = [u for u in incr_lib.list_updates(incr_dir)
               if u not in self._consumed]
    return self._apply_update_blobs(pending)

  def consume_incremental_kafka(self, server: str, topic: str,
                                start_offset: int = 0) -> int:
    """Drain + apply updates from the kafka incremental channel
    (IncrementSaveConfig.kafka; the consumer offset persists on this
    Predictor so repeated calls only apply NEW messages — the reference
    EAS processor consumes the same topic with
    IncrementSaveConfig.Kafka.Consumer.offset)."""
    import io as _io
    from easyrec_tpu.data import kafka_client as kc
    if not hasattr(self, '_kafka_offsets'):
      self._kafka_offsets = {}
    off = self._kafka_offsets.get((server, topic), start_offset)
    consumer = kc.KafkaConsumer(server)
    blobs = []
    try:
      while True:
        records, hwm = consumer.fetch(topic, {0: off}, max_wait_ms=100)
        for _pid, roff, _key, value in sorted(records, key=lambda r: r[1]):
          blobs.append(_io.BytesIO(value))
          off = max(off, roff + 1)
        if not records and off >= hwm.get(0, 0):
          break
    finally:
      consumer.close()
    n = self._apply_update_blobs(blobs)
    self._kafka_offsets[(server, topic)] = off
    return n

  def consume_incremental_datahub(self, endpoint: str, access_id: str,
                                  access_key: str, project: str,
                                  topic: str, start_seq: int = 0) -> int:
    """Drain + apply updates from the DataHub incremental channel
    (IncrementSaveConfig.datahub): TUPLE records (key, part, total,
    payload-b64) are reassembled per key into npz blobs. The consumer
    sequence persists on this Predictor like the kafka offset."""
    import base64
    import io as _io
    from easyrec_tpu.data import datahub_client as dhc
    if not hasattr(self, '_dh_seqs'):
      self._dh_seqs = {}
    skey = (endpoint, project, topic)
    seq = self._dh_seqs.get(skey, start_seq)
    client = dhc.DataHubClient(endpoint, access_id, access_key)
    blobs = []
    partial = {}
    try:
      for shard in client.list_shards(project, topic):
        cursor, cseq = client.get_cursor(project, topic, shard,
                                         dhc.SEQUENCE, sequence=seq)
        _, latest = client.get_cursor(project, topic, shard, dhc.LATEST)
        while cseq < latest:
          records, cursor = client.get_records(project, topic, shard,
                                               cursor)
          if not records:
            break
          for rseq, data in records:
            key, part, total, payload = data
            acc = partial.setdefault(key, [None] * int(total))
            acc[int(part)] = payload
            if all(c is not None for c in acc):
              blobs.append(_io.BytesIO(
                  base64.b64decode(''.join(acc).encode())))
              del partial[key]
            cseq = rseq + 1
          seq = max(seq, cseq)
    finally:
      client.close()
    n = self._apply_update_blobs(blobs)
    self._dh_seqs[skey] = seq
    return n

  @staticmethod
  def _update_step(u):
    """Step stamp of an update (filename update-NNN-step-S.npz, or the
    __meta__ record inside a kafka blob); -1 when unknown."""
    import json as _json
    import re as _re
    import numpy as _np
    if isinstance(u, str):
      m = _re.search(r'-step-(\d+)\.npz$', u)
      return int(m.group(1)) if m else -1
    try:
      pos = u.tell()
      with _np.load(u) as data:
        if '__meta__' in data.files:
          step = int(_json.loads(str(data['__meta__']))['step'])
        else:
          step = -1
      u.seek(pos)
      return step
    except Exception:
      return -1

  def _apply_update_blobs(self, pending) -> int:
    """Apply update payloads (paths or file-like .npz blobs) in order.

    Updates stamped at or before the export's global_step are skipped
    (a fresh server on a NEWER export must not regress to older
    weights). A blob that fails to load (e.g. a half-written file)
    stops the sweep WITHOUT being marked consumed — the already-applied
    prefix is committed and the rest retries next poll."""
    import jax as _jax
    import numpy as _np
    from easyrec_tpu.train import incremental as incr_lib
    if not hasattr(self, '_consumed'):
      self._consumed = set()
    export_step = int(self.meta.get('global_step', -1))
    fresh = []
    for u in pending:
      step = self._update_step(u)
      if 0 <= step <= export_step:
        if isinstance(u, str):
          self._consumed.add(u)      # older than the export: never apply
        continue
      fresh.append(u)
    pending = fresh
    if not pending:
      return 0
    dense = {}
    for path, leaf in _jax.tree_util.tree_leaves_with_path(
        self.state['params']):
      keys = '/'.join(str(p.key) for p in path if hasattr(p, 'key'))
      dense[keys] = _np.asarray(leaf)
    applied = []
    if self.meta.get('big_model'):
      # sparse deltas write through to the memory-mapped KV store (the
      # EAS-processor-applies-deltas analog); dense deltas update params
      self._open_kv(writable=True)
      for u in pending:
        try:
          with _np.load(u) as data:
            for name in data.files:
              if name.startswith('dense/'):
                dense[name[len('dense/'):]] = data[name]
              elif name.startswith('sparse_ids/'):
                key = name[len('sparse_ids/'):]
                store = self._kv_stores[key]
                ids = data[name]
                vals = data['sparse_vals/%s' % key]
                keep = ids < store.rows
                store.update_rows(ids[keep], vals[keep])
        except Exception:            # half-written blob: retry next poll
          break
        applied.append(u)

      def _replace_big(path, leaf):
        keys = '/'.join(str(p.key) for p in path if hasattr(p, 'key'))
        return dense.get(keys, leaf)

      if applied:
        self.state['params'] = _jax.tree_util.tree_map_with_path(
            _replace_big, self.state['params'])
        self._predict_fn = None
        self._consumed.update(u for u in applied if isinstance(u, str))
      return len(applied)
    tables = {k: _np.array(v) for k, v in self.state['tables'].items()}
    for u in pending:
      try:
        incr_lib.apply_update(dense, tables, u)
      except Exception:              # half-written blob: retry next poll
        break
      applied.append(u)
    if not applied:
      return 0

    def _replace(path, leaf):
      keys = '/'.join(str(p.key) for p in path if hasattr(p, 'key'))
      return dense.get(keys, leaf)

    self.state['params'] = _jax.tree_util.tree_map_with_path(
        _replace, self.state['params'])
    self.state['tables'] = tables
    self._predict_fn = None          # rebuild the jitted fn on new weights
    self._consumed.update(u for u in applied if isinstance(u, str))
    return len(applied)

  # -- feeding -------------------------------------------------------------

  def predict_columns(self, columns: Dict[str, np.ndarray]) -> Dict:
    """Raw input columns (one value per sample) -> output dict.

    Missing input columns are filled with defaults so a split-tower
    export (tools/split_model.py) can be fed only its own features."""
    n = len(next(iter(columns.values())))
    for name in self.input_names:
      if name not in columns:
        columns = dict(columns)
        columns[name] = np.array([''] * n, dtype=object)
    echo = {}
    if self.meta.get('export_features'):
      # export_features (reference export.proto:13-59): serving answers
      # carry the input feature values alongside the predictions
      echo = {'feature_%s' % k: np.asarray(v)
              for k, v in columns.items() if k in self.input_names}
    packed = tr.apply_transforms(self.transforms, columns)
    packed['sample_weight'] = np.ones(n, np.float32)
    # pad to the static batch size
    pad = (-n) % self.batch_size
    if pad or n > self.batch_size:
      out_chunks = []
      for lo in range(0, n, self.batch_size):
        chunk = {k: v[lo:lo + self.batch_size] for k, v in packed.items()}
        m = chunk['sample_weight'].shape[0]
        if m < self.batch_size:
          chunk = {k: np.pad(v, [(0, self.batch_size - m)] +
                             [(0, 0)] * (v.ndim - 1))
                   for k, v in chunk.items()}
        res = jax.device_get(self.predict_fn(chunk))
        out_chunks.append({k: np.asarray(v)[:m] for k, v in res.items()})
      out = {k: np.concatenate([c[k] for c in out_chunks])
             for k in out_chunks[0]}
      out.update(echo)
      return out
    res = jax.device_get(self.predict_fn(packed))
    out = {k: np.asarray(v)[:n] for k, v in res.items()}
    out.update(echo)
    return out

  def predict(self, inputs: Iterable[Dict[str, object]]) -> List[Dict]:
    """List of {input_name: value} dicts -> list of output dicts
    (the reference Predictor online API)."""
    rows = list(inputs)
    columns = {}
    for name in self.input_names:
      columns[name] = np.array([row.get(name, '') for row in rows],
                               dtype=object)
    out = self.predict_columns(columns)
    return [{k: v[i] for k, v in out.items()} for i in range(len(rows))]

  def predict_csv(self, input_path: str, output_path: str,
                  reserved_cols: Optional[List[str]] = None,
                  shard_index: int = 0, shard_num: int = 1) -> int:
    """Batch predict a CSV input (same schema as training), writing
    output CSV; returns row count. reserved_cols copies the named input
    columns into the output so predictions can be joined back
    (reference csv_predictor --reserved_cols)."""
    reserved = list(reserved_cols or [])
    pipeline = InputPipeline(
        self.config.data_config, self.feature_configs, input_path,
        mode='predict', batch_size=self.batch_size,
        shard_index=shard_index, shard_num=shard_num,
        extra_fields=reserved, raw_extra_fields=True)
    n_total = 0
    with open(output_path, 'w', newline='') as f:
      writer = None
      for batch in pipeline:
        valid = batch['sample_weight'] > 0
        res_in = {c: np.asarray(batch.pop('raw.%s' % c))
                  for c in reserved}
        res = jax.device_get(self.predict_fn(batch))
        keys = sorted(res.keys())
        if writer is None:
          writer = csv_lib.writer(f)
          writer.writerow(reserved + keys)
        arrays = [np.asarray(res[k]) for k in keys]
        for i in np.nonzero(valid)[0]:
          writer.writerow([_fmt(res_in[c][i]) for c in reserved] +
                          [_fmt(a[i]) for a in arrays])
          n_total += 1
    return n_total


def _fmt(v):
  arr = np.asarray(v)
  if arr.ndim == 0:
    return float(arr) if arr.dtype.kind == 'f' else arr.item()
  return '|'.join(str(float(x)) for x in arr.ravel())
