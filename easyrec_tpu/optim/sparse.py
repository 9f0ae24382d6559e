"""Row-sparse optimizers for embedding tables.

Dense optax updates would touch every row of a multi-GB table each step
(HBM-bandwidth death); these optimizers update only the rows gathered in the
current batch — the TPU analog of the reference's sparse/lazy optimizer path
(AdamAsync/LazyAdam, compat/optimizers.py:294-316, compat/adam_s.py).

Duplicate ids inside a batch are combined with a sort + segment-sum
(static-shape, O(N log N)) so the optimizer math sees each unique row once,
exactly like TF's deduplicated IndexedSlices apply.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def dedup_sum(ids: jnp.ndarray, grads: jnp.ndarray,
              scratch_row: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Combine duplicate row ids: returns (uids [N], ugrads [N, D]).

  Slots beyond the number of unique ids point at `scratch_row` with zero
  gradient, so downstream scatters never corrupt real rows.
  """
  n = ids.shape[0]
  order = jnp.argsort(ids)
  sids = jnp.take(ids, order)
  sgrads = jnp.take(grads, order, axis=0)
  first = jnp.concatenate(
      [jnp.ones((1,), dtype=bool), sids[1:] != sids[:-1]])
  seg = jnp.cumsum(first) - 1                      # [N] segment index
  ugrads = jax.ops.segment_sum(sgrads, seg, num_segments=n)
  uids = jnp.full((n,), scratch_row, dtype=sids.dtype).at[seg].set(sids)
  return uids, ugrads


def _bf16_bits(x):
  """f32 -> RNE bf16 bits in the top 16 of a uint32 (lane-wise)."""
  u = jax.lax.bitcast_convert_type(x, jnp.uint32)
  u = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
  return u & jnp.uint32(0xFFFF0000)


def pack_pair(m, v):
  """Two f32 -> one f32 carrying (bf16(m) << 16 | bf16(v))."""
  u = _bf16_bits(m) | (_bf16_bits(v) >> 16)
  return jax.lax.bitcast_convert_type(u, jnp.float32)


def unpack_pair(mv):
  u = jax.lax.bitcast_convert_type(mv, jnp.uint32)
  m = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                   jnp.float32)
  v = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
  return m, v


@dataclasses.dataclass(frozen=True)
class SparseOptimizer:
  """A row-sparse optimizer: init table-shaped slots, update touched rows.

  Optimizers also expose a BLOCKWISE form for the packed-table Mosaic
  kernel (ops/packed_table.py): `slot_names` orders the slot arrays,
  `hypers(lr, step)` collects the traced scalars, and
  `block_math(olds, g, hyp)` computes new blocks from old f32 blocks
  ([c*8, W], weights first), the summed gradient block, and a scalar
  accessor hyp(k). Static hyperparameters are baked into the closure;
  updates are masked afterwards to touched rows only, matching the
  row-granular lazy semantics of `update_rows`.
  """
  name: str
  init: Callable        # (table) -> state pytree (dict of table-shaped slots)
  update_rows: Callable  # (table, state, uids, ugrads, lr, step) ->
  #                        (new_table, new_state)
  slot_names: Tuple[str, ...] = ()
  hypers: Callable = None       # (lr, step) -> jnp [K] f32
  block_math: Callable = None   # (olds, g, hyp) -> news
  slot_init: Tuple[float, ...] = ()  # initial fill value per slot
  # 2-slot optimizers may ship a COMPACT form: olds = [w f32 block,
  # bf16-pair slot block]; enables the width-128 packed layout
  # (ops/packed_table.py PackMeta compact)
  compact_math: Callable = None


def sparse_sgd() -> SparseOptimizer:
  def init(table):
    return {}

  def update(table, state, uids, ug, lr, step):
    return table.at[uids].add((-lr * ug).astype(table.dtype)), state

  def block(olds, g, hyp):
    return [olds[0] - hyp(0) * g]

  return SparseOptimizer('sgd', init, update, slot_names=(),
                         hypers=lambda lr, step: jnp.stack([lr]),
                         block_math=block, slot_init=())


def sparse_momentum(momentum: float = 0.9) -> SparseOptimizer:
  def init(table):
    return {'m': jnp.zeros_like(table)}

  def update(table, state, uids, ug, lr, step):
    m_rows = momentum * jnp.take(state['m'], uids, axis=0) + ug
    m = state['m'].at[uids].set(m_rows.astype(table.dtype))
    table = table.at[uids].add((-lr * m_rows).astype(table.dtype))
    return table, {'m': m}

  def block(olds, g, hyp):
    w, m = olds
    m_new = momentum * m + g
    return [w - hyp(0) * m_new, m_new]

  return SparseOptimizer('momentum', init, update, slot_names=('m',),
                         hypers=lambda lr, step: jnp.stack([lr]),
                         block_math=block, slot_init=(0.0,))


def sparse_adagrad(initial_accumulator: float = 0.1,
                   eps: float = 1e-10) -> SparseOptimizer:
  def init(table):
    return {'accum': jnp.full_like(table, initial_accumulator)}

  def update(table, state, uids, ug, lr, step):
    acc_rows = jnp.take(state['accum'], uids, axis=0) + jnp.square(ug)
    accum = state['accum'].at[uids].set(acc_rows.astype(table.dtype))
    upd = -lr * ug * jax.lax.rsqrt(acc_rows + eps)
    return table.at[uids].add(upd.astype(table.dtype)), {'accum': accum}

  def block(olds, g, hyp):
    w, acc = olds
    acc_new = acc + jnp.square(g)
    return [w - hyp(0) * g * jax.lax.rsqrt(acc_new + eps), acc_new]

  return SparseOptimizer('adagrad', init, update, slot_names=('accum',),
                         hypers=lambda lr, step: jnp.stack([lr]),
                         block_math=block,
                         slot_init=(initial_accumulator,))


def sparse_adam(b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8,
                weight_decay: float = 0.0) -> SparseOptimizer:
  """Lazy Adam: moments decay/update only on touched rows (the reference's
  AdamAsync semantics). Bias correction uses the global step."""

  def init(table):
    return {'m': jnp.zeros_like(table), 'v': jnp.zeros_like(table)}

  def update(table, state, uids, ug, lr, step):
    t = (step + 1).astype(jnp.float32)
    m_rows = b1 * jnp.take(state['m'], uids, axis=0) + (1 - b1) * ug
    v_rows = b2 * jnp.take(state['v'], uids, axis=0) + (1 - b2) * \
        jnp.square(ug)
    m = state['m'].at[uids].set(m_rows.astype(table.dtype))
    v = state['v'].at[uids].set(v_rows.astype(table.dtype))
    mhat = m_rows / (1 - jnp.power(b1, t))
    vhat = v_rows / (1 - jnp.power(b2, t))
    upd = -lr * mhat / (jnp.sqrt(vhat) + eps)
    if weight_decay:
      upd = upd - lr * weight_decay * jnp.take(table, uids, axis=0)
    return table.at[uids].add(upd.astype(table.dtype)), {'m': m, 'v': v}

  def hypers(lr, step):
    # bias corrections precomputed so the kernel stays transcendental-free
    t = (step + 1).astype(jnp.float32)
    return jnp.stack([lr,
                      1.0 / (1 - jnp.power(b1, t)),
                      1.0 / (1 - jnp.power(b2, t))])

  def block(olds, g, hyp):
    w, m, v = olds
    lr, c1, c2 = hyp(0), hyp(1), hyp(2)
    m_new = b1 * m + (1 - b1) * g
    v_new = b2 * v + (1 - b2) * jnp.square(g)
    upd = -lr * (m_new * c1) / (jnp.sqrt(v_new * c2) + eps)
    if weight_decay:
      upd = upd - lr * weight_decay * w
    return [w + upd, m_new, v_new]

  def compact_block(olds, g, hyp):
    # olds = [w, mv]: moments live as bf16 pairs in one f32 lane block.
    # The w update uses the PRE-ROUNDING f32 moments (full precision in
    # the step; only the carried state is bf16).
    w, mv = olds
    lr, c1, c2 = hyp(0), hyp(1), hyp(2)
    m, v = unpack_pair(mv)
    m_new = b1 * m + (1 - b1) * g
    v_new = b2 * v + (1 - b2) * jnp.square(g)
    upd = -lr * (m_new * c1) / (jnp.sqrt(v_new * c2) + eps)
    if weight_decay:
      upd = upd - lr * weight_decay * w
    return [w + upd, pack_pair(m_new, v_new)]

  return SparseOptimizer('adam', init, update, slot_names=('m', 'v'),
                         hypers=hypers, block_math=block,
                         slot_init=(0.0, 0.0),
                         compact_math=compact_block)


def sparse_ftrl(learning_rate_power: float = -0.5,
                initial_accumulator: float = 0.1,
                l1: float = 0.0, l2: float = 0.0,
                l2_shrinkage: float = 0.0) -> SparseOptimizer:
  def init(table):
    return {'accum': jnp.full_like(table, initial_accumulator),
            'z': jnp.zeros_like(table)}

  def update(table, state, uids, ug, lr, step):
    w = jnp.take(table, uids, axis=0)
    acc_old = jnp.take(state['accum'], uids, axis=0)
    acc_new = acc_old + jnp.square(ug)
    p = -learning_rate_power
    sigma = (jnp.power(acc_new, p) - jnp.power(acc_old, p)) / lr
    # l2_shrinkage (TF FTRL): shrunk gradient feeds z, raw feeds accum
    gz = ug + 2.0 * l2_shrinkage * w if l2_shrinkage else ug
    z_rows = jnp.take(state['z'], uids, axis=0) + gz - sigma * w
    accum = state['accum'].at[uids].set(acc_new.astype(table.dtype))
    z = state['z'].at[uids].set(z_rows.astype(table.dtype))
    w_new = jnp.where(
        jnp.abs(z_rows) <= l1,
        0.0,
        -(z_rows - jnp.sign(z_rows) * l1) /
        (jnp.power(acc_new, p) / lr + 2 * l2))
    return table.at[uids].set(w_new.astype(table.dtype)), \
        {'accum': accum, 'z': z}

  def block(olds, g, hyp):
    w, acc, z = olds
    lr = hyp(0)
    acc_new = acc + jnp.square(g)
    p = -learning_rate_power
    sigma = (jnp.power(acc_new, p) - jnp.power(acc, p)) / lr
    gz = g + 2.0 * l2_shrinkage * w if l2_shrinkage else g
    z_new = z + gz - sigma * w
    w_new = jnp.where(
        jnp.abs(z_new) <= l1,
        0.0,
        -(z_new - jnp.sign(z_new) * l1) /
        (jnp.power(acc_new, p) / lr + 2 * l2))
    return [w_new, acc_new, z_new]

  return SparseOptimizer('ftrl', init, update, slot_names=('accum', 'z'),
                         hypers=lambda lr, step: jnp.stack([lr]),
                         block_math=block,
                         slot_init=(initial_accumulator, 0.0))


def apply_sparse_updates(tables: Dict[str, jnp.ndarray],
                         states: Dict[str, dict],
                         packs: Dict[str, jnp.ndarray],
                         pulled_grads: Dict[str, jnp.ndarray],
                         optimizer: SparseOptimizer,
                         lr: jnp.ndarray,
                         step: jnp.ndarray,
                         scratch_rows: Dict[str, int]):
  """Apply one sparse update per fused table.

  A table may be pulled through several batch views (main batch plus
  'neg.' / 'hard_neg.' sampled-negative views); their ids and pulled-row
  gradients are concatenated before the dedup-sum so negative items also
  receive updates (reference optimizers.py:294-316 IndexedSlices path).
  """
  new_tables, new_states = {}, {}
  for key, table in tables.items():
    id_parts, g_parts = [], []
    for view in (key, 'neg.' + key, 'hard_neg.' + key):
      if view in packs:
        id_parts.append(packs[view].reshape(-1))
        g_parts.append(pulled_grads[view].reshape(
            -1, table.shape[-1]).astype(jnp.float32))
    ids = jnp.concatenate(id_parts) if len(id_parts) > 1 else id_parts[0]
    g = jnp.concatenate(g_parts) if len(g_parts) > 1 else g_parts[0]
    uids, ug = dedup_sum(ids, g, scratch_rows[key])
    new_tables[key], new_states[key] = optimizer.update_rows(
        table, states[key], uids, ug, lr, step)
  return new_tables, new_states


def init_sparse_states(tables: Dict[str, jnp.ndarray],
                       optimizer: SparseOptimizer) -> Dict[str, dict]:
  return {key: optimizer.init(t) for key, t in tables.items()}


def apply_sparse_updates_packed(tables: Dict[str, jnp.ndarray],
                                packs: Dict[str, jnp.ndarray],
                                pulled_grads: Dict[str, jnp.ndarray],
                                optimizer: SparseOptimizer,
                                lr: jnp.ndarray,
                                step: jnp.ndarray,
                                pack_metas: Dict[str, object],
                                use_pallas: bool,
                                interpret: bool = False,
                                mesh=None,
                                stats: Dict[str, jnp.ndarray] = None):
  """Packed-layout twin of apply_sparse_updates: weights + optimizer
  slots live interleaved in ONE combined array per fused table; the
  update is one fused sort/segment-sum prep + one Mosaic group-RMW
  kernel per table (ops/packed_table.py) instead of per-slot XLA
  scatters (the in-step scatter wall, benchmarks/bench_step_ablation).
  """
  from easyrec_tpu.ops import packed_table as pt

  new_tables = {}
  hypers = optimizer.hypers(lr, step)
  for key, table in tables.items():
    meta = pack_metas[key]
    math_fn = optimizer.compact_math \
        if getattr(meta, 'compact', False) else optimizer.block_math
    id_parts, g_parts = [], []
    for view in (key, 'neg.' + key, 'hard_neg.' + key):
      if view in packs:
        id_parts.append(packs[view].reshape(-1))
        g_parts.append(pulled_grads[view].reshape(
            -1, meta.dim).astype(jnp.float32))
    ids = jnp.concatenate(id_parts) if len(id_parts) > 1 else id_parts[0]
    g = jnp.concatenate(g_parts) if len(g_parts) > 1 else g_parts[0]
    if mesh is not None and mesh.devices.size > 1:
      new_tables[key], overflow = _packed_update_sharded(
          mesh, table, ids, g, hypers, math_fn, meta,
          use_pallas, interpret)
      if stats is not None:
        stats['update_overflow'] = \
            stats.get('update_overflow', jnp.int32(0)) + overflow
    else:
      new_tables[key] = pt.apply_packed_update(
          table, ids, g, hypers,
          math_fn, meta, use_pallas, interpret=interpret)
  return new_tables


from easyrec_tpu.parallel.exchange import (build_route, capacity_rows,
                                           exchange_mode, send_to_owners)


def _packed_update_sharded(mesh, table, ids, g, hypers, block_math,
                           meta, use_pallas, interpret):
  """Packed update over a row-sharded table — the TPU-native analog of
  the reference's EmbeddingParallel hvd.alltoall exchange
  (compat/feature_column/feature_column.py:248-357, :307,:321):

  1. each device DEDUPS its local id/grad slice (one sorted segment-sum,
     the reference's `unique` before the exchange);
  2. unique ids are already grouped by owner shard (ids sorted, shards
     own contiguous row blocks) — per-owner send sizes come from one
     searchsorted, no extra partition pass;
  3. ids and summed grads travel by `lax.ragged_all_to_all` (wire bytes
     per device ∝ owned rows, INDEPENDENT of world size — the
     all-gather fallback scales with world size instead);
  4. each owner runs the group-RMW kernel on its local groups.

  This is also the shard_map wrapper the Mosaic kernel needs on
  multi-device meshes (XLA cannot auto-partition a custom call)."""
  from jax import shard_map
  from jax.sharding import PartitionSpec as P

  from easyrec_tpu.ops import packed_table as pt

  axes = ('data', 'model')
  lmeta = meta.local_view()
  local_rows = lmeta.groups * meta.group_rows

  # shard_map needs the id/grad length divisible by the device count
  # (sampled-negative views make it arbitrary); pad with id 0 + zero
  # gradients — dedup merges them and the touched mask keeps bytes
  n_dev = mesh.devices.size
  pad = (-ids.shape[0]) % n_dev
  if pad:
    ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
    g = jnp.concatenate([g, jnp.zeros((pad, g.shape[1]), g.dtype)])

  mode = exchange_mode(mesh)
  n_loc = ids.shape[0] // n_dev

  def local_fn_allgather(tbl, ids_l, g_l, hyp):
    ids_all = jax.lax.all_gather(ids_l, axes, tiled=True)
    g_all = jax.lax.all_gather(g_l, axes, tiled=True)
    shard = jax.lax.axis_index(axes)
    base = shard.astype(jnp.int32) * local_rows
    lids = ids_all.astype(jnp.int32) - base
    mine = (lids >= 0) & (lids < local_rows)
    lids = jnp.where(mine, lids, 0)
    g_all = jnp.where(mine[:, None], g_all, 0.0)
    # predicated DMAs: on most shards the local scratch group holds
    # REAL rows — padding entries must not duplicate a live group's push
    new = pt.apply_packed_update(tbl, lids, g_all, hyp, block_math,
                                 lmeta, use_pallas, interpret=interpret,
                                 predicate=True)
    return new, jnp.zeros((), jnp.int32)

  def local_fn_a2a(tbl, ids_l, g_l, hyp):
    # 1. local dedup: scratch id = n_dev*local_rows sorts PAST every real
    #    id, so uids stays ascending with padding at the tail (owner index
    #    n_dev -> sent nowhere)
    scratch = n_dev * local_rows
    uids, ug = dedup_sum(ids_l.astype(jnp.int32), g_l, scratch)
    # 2-3. owner-partitioned routing with capacity-bounded owner buffers
    # (parallel/exchange.py; dropped rows skip one step's update and are
    # counted into the replicated overflow output). live_owners: shards
    # holding REAL rows — padded packed geometry parks small tables'
    # rows on the first shards only
    live = -(-meta.rows // local_rows)
    route = build_route(uids, local_rows, n_dev, axes,
                        cap=capacity_rows(n_loc, n_dev, live))
    emulate = (mode == 'a2a_emulated')
    # ids travel OWNER-relative: the chunk for owner t holds ids in
    # [t*local_rows, (t+1)*local_rows) -> id % local_rows is t-local.
    # Untouched slots: local row 0 with zero grad (merged harmlessly).
    lids_send = (uids % local_rows).astype(jnp.int32)
    rids = send_to_owners(route, lids_send, 0, axes, emulate, n_dev)
    rg = send_to_owners(route, ug, 0, axes, emulate, n_dev)
    rids = jnp.clip(rids, 0, local_rows - 1)  # defensive
    new = pt.apply_packed_update(tbl, rids, rg, hyp, block_math,
                                 lmeta, use_pallas, interpret=interpret,
                                 predicate=True)
    return new, jax.lax.psum(route.overflow, axes)

  local_fn = local_fn_allgather if mode == 'allgather' else local_fn_a2a
  # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
  # annotation, which the default vma check rejects (caught by the
  # shard_map x interpret-Mosaic parity test — would fail on a real pod)
  fn = shard_map(
      local_fn, mesh=mesh,
      in_specs=(P(axes, None), P(axes), P(axes, None), P()),
      out_specs=(P(axes, None), P()), check_vma=False)
  return fn(table, ids, g, hypers)
