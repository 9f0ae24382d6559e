"""Big-model export: embedding tables in a file-backed KV store with
memory-bounded lazy serving.

The reference's export_big_model (easy_rec/python/utils/
export_big_model.py:43,311 + meta_graph_editor.py) strips embedding
weights out of the SavedModel, writes them to redis/OSS, and splices
lookup ops into the serving graph so arbitrarily large tables never
load into serving RAM. There is no redis here; the TPU-native analog
keeps the MECHANISM with a local store:

- export writes each fused table as a raw row-major `.bin` file under
  `<export>/kv/` plus a manifest (rows/dim/dtype per table); the orbax
  variables bundle carries params only.
- the Predictor memory-maps the bins and gathers ONLY the rows a batch
  needs (np.memmap fancy indexing; the OS page cache plays the role of
  the redis LRU). The forward pass is split: host-side id packing +
  memmap gather, then the jitted dense forward on (batch, pulled).
- incremental updates (IncrementSaveConfig fs channel) write through
  to the mapped files — the serving-side equivalent of the EAS
  processor applying sparse deltas to its store.

Swapping the file backend for a real remote KV (redis cluster, OSS) is
a transport change only: implement KVTableStore.gather/update_rows
against the remote API.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

KV_DIR = 'kv'
MANIFEST = 'kv_manifest.json'


def write_kv_store(export_dir: str,
                   tables: Dict[str, np.ndarray]) -> str:
  """Write tables as raw row-major bins + manifest; returns kv dir."""
  kv_dir = os.path.join(export_dir, KV_DIR)
  os.makedirs(kv_dir, exist_ok=True)
  manifest = {}
  for key, arr in tables.items():
    arr = np.ascontiguousarray(np.asarray(arr, np.float32))
    path = os.path.join(kv_dir, '%s.bin' % key)
    arr.tofile(path)
    manifest[key] = {'rows': int(arr.shape[0]),
                     'dim': int(arr.shape[1]),
                     'dtype': 'float32'}
  with open(os.path.join(kv_dir, MANIFEST), 'w') as f:
    json.dump(manifest, f, indent=2)
  return kv_dir


class KVTableStore:
  """One memory-mapped table: gather rows lazily, write deltas through."""

  def __init__(self, kv_dir: str, key: str, spec: dict,
               writable: bool = False):
    self.key = key
    self.rows = spec['rows']
    self.dim = spec['dim']
    self._map = np.memmap(os.path.join(kv_dir, '%s.bin' % key),
                          dtype=np.float32,
                          mode='r+' if writable else 'r',
                          shape=(self.rows, self.dim))

  def gather(self, ids: np.ndarray) -> np.ndarray:
    """[...]-shaped int ids -> [..., dim] rows (only touched pages are
    faulted in)."""
    flat = np.asarray(ids).reshape(-1)
    out = np.asarray(self._map[np.clip(flat, 0, self.rows - 1)])
    return out.reshape(ids.shape + (self.dim,))

  def update_rows(self, ids: np.ndarray, values: np.ndarray) -> None:
    self._map[np.asarray(ids).reshape(-1)] = \
        np.asarray(values, np.float32).reshape(-1, self.dim)
    self._map.flush()


def open_kv_store(export_dir: str,
                  writable: bool = False) -> Dict[str, KVTableStore]:
  kv_dir = os.path.join(export_dir, KV_DIR)
  with open(os.path.join(kv_dir, MANIFEST)) as f:
    manifest = json.load(f)
  return {key: KVTableStore(kv_dir, key, spec, writable=writable)
          for key, spec in manifest.items()}


def pack_ids_np(layout, batch: Dict[str, np.ndarray]
                ) -> Dict[str, np.ndarray]:
  """Host-side twin of ops/embedding.pack_ids (numpy, no device round
  trip): one [B, totK] int64 pack per fused table."""
  packs = {}
  for key, table in layout.tables.items():
    cols = []
    for use in table.uses:
      ids = np.asarray(batch['feat.%s.ids' % use.feature])
      cols.append(ids.astype(np.int64) + use.offset)
    if cols:
      packs[key] = np.concatenate(cols, axis=1) if len(cols) > 1 \
          else cols[0]
  return packs
