"""EVParams semantics on static hash tables: frequency-filtered
admission (filter_freq) + TTL eviction (steps_to_live).

The reference's PAI EmbeddingVariable (protos/feature_config.proto
EVParams; compat/feature_column/feature_column_v2.py ev_params) is a
growing KV store that (a) creates an embedding only after an id has
been seen `filter_freq` times and (b) frees ids not seen for
`steps_to_live` steps. On TPU the tables are static hash buckets, so
the equivalents are:

- EV-enabled member ranges initialize to ZERO, so an id without a
  trained embedding reads the reference's default value everywhere
  (train, eval, serving export) with no extra masking outside train.
- A per-fused-table COUNT aux table accumulates occurrences; during
  training, pulled embeddings of not-yet-admitted id slots are masked
  to zero — the mask also zeroes their gradients in backward, so the
  sparse update's touched-row logic skips them (no accidental training
  before admission). Admission uses the count BEFORE the current batch
  (one-batch delay vs the reference's in-place counting).
- A LAST-SEEN aux table records the global step per touched id; rows
  stale beyond steps_to_live are swept back to zero (weights + slots)
  before every checkpoint save — lazy eviction at checkpoint cadence
  instead of the EV store's background reclamation.

Both aux tables are [rows, 1] embeddings updated through the SAME
sparse machinery as the weights (packed Mosaic kernel on TPU, row
scatter elsewhere), so EV mode inherits the scatter-free fast path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TableEv:
  """EV config of one fused table."""
  thr_cols: np.ndarray          # [totK] int32 admission threshold per
  #                               pack column (0 = feature not filtered)
  ttl: int                      # max steps_to_live over members (0=off)
  row_segments: tuple           # ((start, end, filter_freq, ttl), ...)

  @property
  def enabled(self) -> bool:
    return bool(self.thr_cols.max() > 0 or self.ttl > 0)


def build_ev_plan(layout, specs) -> Optional[Dict[str, TableEv]]:
  """Per fused table: admission thresholds per id-pack column + TTL.
  Returns None when no feature sets ev_params."""
  plan = {}
  any_ev = False
  for key, table in layout.tables.items():
    thr = np.zeros((table.tot_k,), np.int32)
    segs = []
    ttl = 0
    for use in table.uses:
      spec = specs[use.feature]
      cfg = spec.config
      ff = lv = 0
      if cfg is not None and cfg.HasField('ev_params'):
        ff = int(cfg.ev_params.filter_freq)
        lv = int(cfg.ev_params.steps_to_live)
      thr[use.start:use.start + use.k] = ff
      off = table.offsets[
          spec.table_name if use.role == 'deep'
          else spec.table_name + '__wide']
      segs.append((off, off + table.member_rows[
          spec.table_name if use.role == 'deep'
          else spec.table_name + '__wide'], ff, lv))
      ttl = max(ttl, lv)
    ev = TableEv(thr_cols=thr, ttl=ttl, row_segments=tuple(segs))
    if ev.enabled:
      any_ev = True
    plan[key] = ev
  return plan if any_ev else None


def ev_metas(pack_metas_or_layout, plan, pad_rows_to=1, shards=1):
  """dim-1 PackMeta per EV-enabled table (packed mode)."""
  from easyrec_tpu.ops.packed_table import PackMeta
  metas = {}
  for key, ev in plan.items():
    if not ev.enabled:
      continue
    base = pack_metas_or_layout[key]
    metas[key] = PackMeta(base.rows, 1, 1, shards=shards)
  return metas


def init_ev_state(layout, plan, packed_metas, rules,
                  packed: bool) -> Dict[str, dict]:
  """Zero count/last-seen aux tables per EV-enabled fused table."""
  out = {}
  for key, ev in plan.items():
    if not ev.enabled:
      continue
    aux = {}
    if packed:
      meta = packed_metas[key]
      shape = (meta.phys_rows, meta.width)
    else:
      rows = layout.tables[key].rows
      pad = rules.table_pad_rows()
      rows = ((rows + pad - 1) // pad) * pad
      shape = (rows, 1)
    mk = jax.jit(lambda: jnp.zeros(shape, jnp.float32),
                 out_shardings=rules.table)
    if ev.thr_cols.max() > 0:
      aux['ev_count'] = mk()
    if ev.ttl > 0:
      aux['ev_last'] = mk()
    out[key] = aux
  return out


def mask_pulled(pulled: Dict[str, jnp.ndarray],
                packs: Dict[str, jnp.ndarray],
                slots: Dict[str, dict],
                plan: Dict[str, TableEv],
                ev_pack_metas, step) -> Dict[str, jnp.ndarray]:
  """Zero the pulled embeddings of id slots that are not yet admitted
  (count < filter_freq) or stale (step - last_seen > ttl). The mask
  flows through backward, so their gradients vanish and the sparse
  update leaves their rows untouched."""
  from easyrec_tpu.ops import packed_table as pt
  out = dict(pulled)
  for key, ev in plan.items():
    if not ev.enabled or key not in pulled:
      continue
    aux = slots.get(key, {})
    keep = None
    if 'ev_count' in aux:
      meta1 = ev_pack_metas.get(key) if ev_pack_metas else None
      if meta1 is not None:
        counts = pt.pull(aux['ev_count'], packs[key], meta1)[..., 0]
      else:
        counts = jnp.take(aux['ev_count'], packs[key], axis=0)[..., 0]
      thr = jnp.asarray(ev.thr_cols, jnp.float32)[None, :]
      keep = counts >= thr
    if 'ev_last' in aux and ev.ttl > 0:
      meta1 = ev_pack_metas.get(key) if ev_pack_metas else None
      if meta1 is not None:
        last = pt.pull(aux['ev_last'], packs[key], meta1)[..., 0]
      else:
        last = jnp.take(aux['ev_last'], packs[key], axis=0)[..., 0]
      fresh = (step.astype(jnp.float32) - last) <= float(ev.ttl)
      keep = fresh if keep is None else (keep & fresh)
    if keep is not None:
      out[key] = pulled[key] * keep[..., None].astype(pulled[key].dtype)
  return out


def update_ev_state(slots: Dict[str, dict],
                    packs: Dict[str, jnp.ndarray],
                    plan: Dict[str, TableEv],
                    ev_pack_metas, step,
                    use_pallas: bool, mesh=None,
                    scratch_rows=None) -> Dict[str, dict]:
  """counts += occurrences; last_seen = step, for every id in the
  batch (all views). Runs through the packed group-RMW kernel when
  available, else row scatters."""
  from easyrec_tpu.ops import packed_table as pt
  from easyrec_tpu.optim import sparse as sparse_lib

  new_slots = {k: dict(v) for k, v in slots.items()}
  for key, ev in plan.items():
    if not ev.enabled:
      continue
    aux = new_slots.get(key, {})
    id_parts = [packs[v].reshape(-1)
                for v in (key, 'neg.' + key, 'hard_neg.' + key)
                if v in packs]
    ids = jnp.concatenate(id_parts) if len(id_parts) > 1 else id_parts[0]
    ones = jnp.ones((ids.shape[0], 1), jnp.float32)
    meta1 = ev_pack_metas.get(key) if ev_pack_metas else None
    stepf = step.astype(jnp.float32)

    if meta1 is not None:
      def add_math(olds, g, hyp):
        return [olds[0] + g]

      def set_math(olds, g, hyp):
        return [jnp.full_like(olds[0], hyp(0))]

      def run(table, math_fn, hyp):
        if mesh is not None and mesh.devices.size > 1:
          return sparse_lib._packed_update_sharded(
              mesh, table, ids, ones, hyp, math_fn, meta1,
              use_pallas, False)
        return pt.apply_packed_update(table, ids, ones, hyp, math_fn,
                                      meta1, use_pallas)

      if 'ev_count' in aux:
        aux['ev_count'] = run(aux['ev_count'], add_math,
                              jnp.stack([stepf]))
      if 'ev_last' in aux:
        aux['ev_last'] = run(aux['ev_last'], set_math,
                             jnp.stack([stepf]))
    else:
      scratch = scratch_rows[key]
      uids, ug = sparse_lib.dedup_sum(ids, ones, scratch)
      if 'ev_count' in aux:
        aux['ev_count'] = aux['ev_count'].at[uids].add(ug)
      if 'ev_last' in aux:
        touched = (ug[:, 0] > 0)
        upd = jnp.where(touched, stepf,
                        jnp.take(aux['ev_last'], uids, axis=0)[:, 0])
        aux['ev_last'] = aux['ev_last'].at[uids].set(upd[:, None])
    new_slots[key] = aux
  return new_slots


def evict_stale(state, plan, pack_metas, ev_pack_metas,
                layout) -> 'object':
  """Sweep: zero the weights (and interleaved optimizer slots) of rows
  whose last-seen step is stale beyond their ttl. Run before
  checkpoint saves (lazy eviction at checkpoint cadence). Dense
  elementwise pass over each EV-enabled table."""
  import numpy as np  # noqa: F811

  new_tables = dict(state.tables)
  step = state.step.astype(jnp.float32)
  for key, ev in plan.items():
    aux = state.slots.get(key, {})
    if not ev.enabled or ev.ttl <= 0 or 'ev_last' not in aux:
      continue
    table = state.tables[key]
    if pack_metas is not None:
      meta = pack_metas[key]
      meta1 = ev_pack_metas[key]
      # the dim-1 packed aux IS in logical order when flattened
      # ((g, s, lane) traversal == logical row order for dim 1)
      lastv = aux['ev_last'].reshape(-1)[:meta1.rows_padded]
      stale = (step - lastv) > float(ev.ttl)             # [rows_padded]
      rows_c = min(meta.rows_padded, stale.shape[0])
      stale_c = jnp.zeros((meta.rows_padded,), bool).at[:rows_c].set(
          stale[:rows_c])
      # expand to the combined layout: (G, 8, pack) broadcast over cc
      mask = jnp.broadcast_to(
          stale_c.reshape(meta.groups, 8, meta.pack, 1),
          (meta.groups, 8, meta.pack, meta.cc)).reshape(table.shape)
      new_tables[key] = jnp.where(mask, 0.0, table)
    else:
      lastv = aux['ev_last'][:, 0]
      stale = (step - lastv) > float(ev.ttl)
      new_tables[key] = jnp.where(stale[:, None], 0.0, table)
  return state.replace(tables=new_tables)
