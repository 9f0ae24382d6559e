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
- A per-fused-table COUNT aux table accumulates occurrences of
  TRAINING-DATA ids (the base batch view only — sampled negatives and
  their zero-id filler columns do not count); during training, pulled
  embeddings of not-yet-admitted id slots are masked to zero in EVERY
  view (base + sampled-negative views), so their gradients vanish and
  the sparse update's touched-row logic skips them. Admission uses the
  count BEFORE the current batch (one-batch delay vs the reference's
  in-place counting).
- A LAST-SEEN aux table records the global step per touched id; rows
  stale beyond their feature's steps_to_live are swept back to zero —
  weights, optimizer slots, AND the ev counters (the id must re-earn
  admission, like the EV store freeing it) — before every checkpoint
  save. The sweep respects per-member row segments: co-fused features
  without steps_to_live are never touched.

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
  ttl_cols: np.ndarray          # [totK] int32 TTL per pack column
  #                               (0 = feature opted out of TTL)
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
    ttl_cols = np.zeros((table.tot_k,), np.int32)
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
      ttl_cols[use.start:use.start + use.k] = lv
      tname = spec.table_name if use.role == 'deep' \
          else spec.table_name + '__wide'
      off = table.offsets[tname]
      segs.append((off, off + table.member_rows[tname], ff, lv))
      ttl = max(ttl, lv)
    ev = TableEv(thr_cols=thr, ttl=ttl, ttl_cols=ttl_cols,
                 row_segments=tuple(segs))
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


def _lookup_dim1(aux, pack, meta1):
  """Pull a dim-1 aux value per id slot ([B, totK])."""
  from easyrec_tpu.ops import packed_table as pt
  if meta1 is not None:
    return pt.pull(aux, pack, meta1)[..., 0]
  return jnp.take(aux, pack, axis=0)[..., 0]


def mask_pulled(pulled: Dict[str, jnp.ndarray],
                packs: Dict[str, jnp.ndarray],
                slots: Dict[str, dict],
                plan: Dict[str, TableEv],
                ev_pack_metas, step) -> Dict[str, jnp.ndarray]:
  """Zero the pulled embeddings of id slots that are not yet admitted
  (count < filter_freq) or stale (step - last_seen > ttl), in EVERY
  batch view (base + sampled-negative views — negatives of unadmitted
  ids must not leak gradients either). The mask flows through backward,
  so their gradients vanish and the sparse update leaves their rows
  untouched."""
  out = dict(pulled)
  for key, ev in plan.items():
    if not ev.enabled:
      continue
    aux = slots.get(key, {})
    meta1 = ev_pack_metas.get(key) if ev_pack_metas else None
    for view in (key, 'neg.' + key, 'hard_neg.' + key):
      if view not in pulled:
        continue
      pack = packs[view]
      keep = None
      if 'ev_count' in aux:
        counts = _lookup_dim1(aux['ev_count'], pack, meta1)
        thr = jnp.asarray(ev.thr_cols, jnp.float32)[None, :]
        keep = counts >= thr
      if 'ev_last' in aux and ev.ttl > 0:
        last = _lookup_dim1(aux['ev_last'], pack, meta1)
        ttl_c = jnp.asarray(ev.ttl_cols, jnp.float32)[None, :]
        age = step.astype(jnp.float32) - last
        # per-column gating: co-fused features without steps_to_live
        # (ttl 0) are never TTL-masked
        fresh = (age <= ttl_c) | (ttl_c <= 0)
        keep = fresh if keep is None else (keep & fresh)
      if keep is not None:
        out[view] = pulled[view] * keep[..., None].astype(
            pulled[view].dtype)
  return out


def update_ev_state(slots: Dict[str, dict],
                    packs: Dict[str, jnp.ndarray],
                    plan: Dict[str, TableEv],
                    ev_pack_metas, step,
                    use_pallas: bool, mesh=None,
                    scratch_rows=None) -> Dict[str, dict]:
  """counts += occurrences; last_seen = step — for TRAINING-DATA ids
  only (the base view). Sampled-negative views are excluded: their
  zero-id filler columns would spuriously admit fused-table row 0, and
  a sampled item is not an observed occurrence. Runs through the packed
  group-RMW kernel when available, else row scatters."""
  from easyrec_tpu.ops import packed_table as pt
  from easyrec_tpu.optim import sparse as sparse_lib

  new_slots = {k: dict(v) for k, v in slots.items()}
  for key, ev in plan.items():
    if not ev.enabled or key not in packs:
      continue
    aux = new_slots.get(key, {})
    ids = packs[key].reshape(-1)
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
          new, _overflow = sparse_lib._packed_update_sharded(
              mesh, table, ids, ones, hyp, math_fn, meta1,
              use_pallas, False)
          return new
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
  """Sweep: rows stale beyond their feature's steps_to_live are reset —
  weights, optimizer slots, and the ev counters (so the id must re-earn
  admission with fresh state, like the EV store freeing it). Run before
  checkpoint saves (lazy eviction at checkpoint cadence).

  Per-member row segments gate the sweep: co-fused features without
  steps_to_live keep their rows; never-seen rows of TTL features ARE
  swept (they are zero-init anyway under filter_freq; for pure-TTL
  features the reference also frees untouched ids eventually)."""
  new_tables = dict(state.tables)
  new_slots = {k: dict(v) for k, v in state.slots.items()}
  step = state.step.astype(jnp.float32)
  for key, ev in plan.items():
    aux = state.slots.get(key, {})
    if not ev.enabled or ev.ttl <= 0 or 'ev_last' not in aux:
      continue
    table = state.tables[key]
    packed = pack_metas is not None
    if packed:
      meta1 = ev_pack_metas[key]
      # the dim-1 packed aux IS in logical order when flattened
      # ((g, s, lane) traversal == logical row order for dim 1)
      lastv = aux['ev_last'].reshape(-1)[:meta1.rows_padded]
    else:
      lastv = aux['ev_last'][:, 0]
    nrows = lastv.shape[0]
    r = jnp.arange(nrows, dtype=jnp.int32)
    stale = jnp.zeros((nrows,), bool)
    for start, end, _ff, lv in ev.row_segments:
      if lv <= 0:
        continue                    # member without steps_to_live
      stale = stale | ((r >= start) & (r < end) &
                       ((step - lastv) > float(lv)))

    # reset the ev counters for evicted rows
    aux2 = dict(aux)
    for name in ('ev_count', 'ev_last'):
      if name in aux2:
        a = aux2[name]
        mask = stale.reshape(a.shape) if packed else stale[:, None]
        aux2[name] = jnp.where(mask, 0.0, a)

    if packed:
      meta = pack_metas[key]
      rows_c = min(meta.rows_padded, nrows)
      stale_c = jnp.zeros((meta.rows_padded,), bool).at[:rows_c].set(
          stale[:rows_c])
      # expand to the combined layout: (G, 8, pack) broadcast over cc —
      # this zeroes the interleaved optimizer slots along with weights
      mask = jnp.broadcast_to(
          stale_c.reshape(meta.groups, 8, meta.pack, 1),
          (meta.groups, 8, meta.pack, meta.cc)).reshape(table.shape)
      new_tables[key] = jnp.where(mask, 0.0, table)
    else:
      srows = min(table.shape[0], nrows)
      stale_t = stale[:srows]
      mask = jnp.zeros((table.shape[0],), bool).at[:srows].set(stale_t)
      new_tables[key] = jnp.where(mask[:, None], 0.0, table)
      # plain mode keeps optimizer slots in separate arrays — reset them
      for name in list(aux2):
        if not name.startswith('ev_'):
          aux2[name] = jnp.where(mask[:, None], 0.0, aux2[name])
    new_slots[key] = aux2
  return state.replace(tables=new_tables, slots=new_slots)
