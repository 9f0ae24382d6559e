"""Measure the packed-v2 sparse-embedding design on the real TPU.

Design under test (round-2 of PERF.md "packed mega-row" follow-up):
  - weights / Adam m / Adam v each stored SEPARATELY in the packed
    geometry [G*8, W] with W = lcm(dim, 128): logical row r lives at
    physical row (r // group_rows) * 8 + (r % group_rows) // pack,
    lanes [lane*dim, (lane+1)*dim) with lane = r % pack.
  - forward gather = plain phys-row take + one-hot lane select + static
    0/1 matmul (everything 128-lane aligned; no dynamic-minor gathers,
    which XLA lowers 180-1000x slow — PERF.md).
  - sparse update = group-level dedup -> XLA [8, W] slice gather (fast:
    dynamic ROW offsets only) -> vectorized optimizer math with
    touched-row masking -> Mosaic per-group DMA push-back (the
    validated 240 GB/s kernel, benchmarks/bench_pallas_group_dma.py),
    one push per array.

Run:  python benchmarks/bench_packed_v2.py
Parity is checked at small scale; timing at flagship bench shapes
(26M x 16 deep + 26M x 1 wide, batch 4096 x 26 features) against the
current plain-layout take + 3x XLA scatter path.
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.optim import sparse as sparse_lib


# ---------------------------------------------------------------- geometry

class PackMeta:

  def __init__(self, rows: int, dim: int):
    self.rows = rows
    self.dim = dim
    self.pack = 128 // math.gcd(dim, 128)
    self.width = self.pack * dim                   # lcm(dim, 128)
    self.group_rows = 8 * self.pack
    # one sacrificial group at the end for dedup padding
    self.groups = rows // self.group_rows + 2
    self.rows_padded = self.groups * self.group_rows
    self.scratch = self.rows_padded - self.group_rows
    self.scratch_gid = self.groups - 1


def pack_table_host(table: np.ndarray, meta: PackMeta) -> np.ndarray:
  """[R, dim] -> packed [G*8, width] (host-side reference impl)."""
  r, d = table.shape
  full = np.zeros((meta.rows_padded, d), table.dtype)
  full[:r] = table
  v = full.reshape(meta.groups, 8, meta.pack, d)
  return np.ascontiguousarray(v.reshape(meta.groups * 8, meta.width))


def phys_rows(ids, meta: PackMeta):
  g = ids // meta.group_rows
  within = ids % meta.group_rows
  return g * 8 + within // meta.pack, within % meta.pack


# ---------------------------------------------------------------- forward

def fwd_plain(table, ids):
  return jnp.take(table, ids, axis=0)


def _lane_gather_matrix(meta: PackMeta):
  t = np.zeros((meta.width, meta.dim), np.float32)
  for j in range(meta.width):
    t[j, j % meta.dim] = 1.0
  return jnp.asarray(t)


def fwd_packed(packed, ids, meta: PackMeta, tmat):
  prow, lane = phys_rows(ids, meta)
  r = jnp.take(packed, prow, axis=0)                       # [N, W]
  col_lane = jnp.arange(meta.width, dtype=jnp.int32) // meta.dim
  mask = (col_lane[None, :] == lane[:, None]).astype(r.dtype)
  # 0/1 matmul must keep the f32 mantissa (TPU matmuls default to bf16)
  return jax.lax.dot(r * mask, tmat.astype(r.dtype),
                     precision=jax.lax.Precision.HIGHEST)  # [N, dim]


# ---------------------------------------------------------------- update

def group_prep(uids, ug, meta: PackMeta):
  """sorted unique logical ids + grads [n, dim] -> unique group ids [n],
  dense per-physical-row grads [n, 8, W] (same padding contract as
  dedup_sum: tail slots point at the scratch group with zero grads)."""
  n = uids.shape[0]
  gids = uids // meta.group_rows
  within = uids % meta.group_rows
  sub = within // meta.pack
  lane = within % meta.pack
  first = jnp.concatenate([jnp.ones((1,), bool), gids[1:] != gids[:-1]])
  gseg = jnp.cumsum(first) - 1
  ugids = jnp.full((n,), meta.scratch_gid, gids.dtype).at[gseg].set(gids)
  tiled = jnp.tile(ug.astype(jnp.float32), (1, meta.pack))  # [n, W]
  col = jnp.arange(meta.width) // meta.dim
  expanded = jnp.where(col[None, :] == lane[:, None], tiled, 0.0)
  flat = gseg * 8 + sub
  gg = jax.ops.segment_sum(expanded, flat, num_segments=n * 8,
                           indices_are_sorted=True)
  # touched-row (lane-block) mask, computed 128-aligned via the static
  # block-diagonal matmul (narrow [., pack, dim] reshapes tile-pad)
  block = jnp.asarray(np.kron(np.eye(meta.pack, dtype=np.float32),
                              np.ones((meta.dim, meta.dim), np.float32)))
  touched = ((gg != 0.0).astype(jnp.float32) @ block) > 0.0
  return ugids, gg.reshape(n, 8, meta.width), \
      touched.reshape(n, 8, meta.width)


def take_groups(packed, ugids, meta: PackMeta):
  dnums = jax.lax.GatherDimensionNumbers(
      offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
  return jax.lax.gather(packed, (ugids * 8)[:, None], dnums,
                        (8, meta.width), mode='clip')


def push_groups_pallas(packed, ugids, new_rows, meta: PackMeta):
  """Scattered write-back: one aligned [8, W] DMA per group.

  ugids must be unique except for trailing scratch-group padding;
  padded slots must carry the scratch group's CURRENT bytes so duplicate
  writes are identical.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  _LANE = 64
  n = ugids.shape[0]
  chunk = min(512, max(_LANE, (6 << 20) // (8 * meta.width * 4)
                       // _LANE * _LANE))
  pad = (-n) % chunk
  if pad:
    ugids = jnp.concatenate(
        [ugids, jnp.full((pad,), meta.scratch_gid, ugids.dtype)])
    scratch_rows = jnp.broadcast_to(
        jax.lax.dynamic_slice_in_dim(
            packed, meta.scratch_gid * 8, 8)[None],
        (pad, 8, meta.width))
    new_rows = jnp.concatenate([new_rows, scratch_rows.astype(
        new_rows.dtype)])
  n_pad = ugids.shape[0]
  gid2 = ugids.astype(jnp.int32).reshape(n_pad // _LANE, _LANE)
  packed3 = packed.reshape(meta.groups, 8, meta.width)

  def kernel(gid_ref, rows_ref, tbl_ref, out_ref, sem_out):
    def push(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(rows_ref.at[i], out_ref.at[rid],
                            sem_out).start()
      return 0

    def wait(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(rows_ref.at[i], out_ref.at[rid],
                            sem_out).wait()
      return 0

    jax.lax.fori_loop(0, chunk, push, 0)
    jax.lax.fori_loop(0, chunk, wait, 0)

  fn = pl.pallas_call(
      kernel,
      grid=(n_pad // chunk,),
      in_specs=[
          pl.BlockSpec((chunk // _LANE, _LANE), lambda i: (i, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((chunk, 8, meta.width), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct(packed3.shape, packed3.dtype),
      scratch_shapes=[pltpu.SemaphoreType.DMA],
      input_output_aliases={2: 0},
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
  )
  return fn(gid2, new_rows.reshape(n_pad, 8, meta.width),
            packed3).reshape(meta.groups * 8, meta.width)


def adam_update_packed(w, m, v, ids, grads, meta: PackMeta, lr, step,
                       use_pallas=True):
  """Full packed-v2 Adam: dedup -> group prep -> gather -> math -> push."""
  uids, ug = sparse_lib.dedup_sum(ids, grads, meta.scratch)
  ugids, gg, touched = group_prep(uids, ug, meta)
  gw = take_groups(w, ugids, meta).astype(jnp.float32)
  gm = take_groups(m, ugids, meta).astype(jnp.float32)
  gv = take_groups(v, ugids, meta).astype(jnp.float32)
  b1, b2, eps = 0.9, 0.999, 1e-8
  t = (step + 1).astype(jnp.float32)
  nm = b1 * gm + (1 - b1) * gg
  nv = b2 * gv + (1 - b2) * jnp.square(gg)
  mhat = nm / (1 - jnp.power(b1, t))
  vhat = nv / (1 - jnp.power(b2, t))
  nw = gw - lr * mhat / (jnp.sqrt(vhat) + eps)
  nw = jnp.where(touched, nw, gw)
  nm = jnp.where(touched, nm, gm)
  nv = jnp.where(touched, nv, gv)
  if use_pallas:
    w2 = push_groups_pallas(w, ugids, nw.astype(w.dtype), meta)
    m2 = push_groups_pallas(m, ugids, nm.astype(m.dtype), meta)
    v2 = push_groups_pallas(v, ugids, nv.astype(v.dtype), meta)
  else:
    w2 = w.reshape(meta.groups, 8, meta.width).at[ugids].set(
        nw.astype(w.dtype)).reshape(w.shape)
    m2 = m.reshape(meta.groups, 8, meta.width).at[ugids].set(
        nm.astype(m.dtype)).reshape(m.shape)
    v2 = v.reshape(meta.groups, 8, meta.width).at[ugids].set(
        nv.astype(v.dtype)).reshape(v.shape)
  return w2, m2, v2


def adam_update_plain(w, m, v, ids, grads, scratch, lr, step):
  uids, ug = sparse_lib.dedup_sum(ids, grads, scratch)
  opt = sparse_lib.sparse_adam()
  nw, st = opt.update_rows(w, {'m': m, 'v': v}, uids, ug, lr, step)
  return nw, st['m'], st['v']


# ---------------------------------------------------------------- harness

def sync(x):
  jax.block_until_ready(x)
  leaf = jax.tree_util.tree_leaves(x)[0]
  _ = float(leaf[(0,) * leaf.ndim])  # honest device fetch, no full copy


def time_threaded(fn, state, args, iters):
  """fn(*state, *args) -> new state tuple; state buffers are donated."""
  for _ in range(3):
    state = fn(*state, *args)
  sync(state)
  t0 = time.perf_counter()
  for _ in range(iters):
    state = fn(*state, *args)
  sync(state)
  return (time.perf_counter() - t0) / iters, state


def time_simple(fn, *args, iters=20):
  for _ in range(3):
    out = fn(*args)
  sync(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  sync(out)
  return (time.perf_counter() - t0) / iters


def check_parity(dim):
  """Small-scale numerical parity: packed vs plain forward + Adam."""
  rows, n_ids = 4096, 777
  meta = PackMeta(rows, dim)
  rng = np.random.RandomState(0)
  w_np = rng.randn(rows, dim).astype(np.float32)
  ids_np = rng.randint(0, rows, n_ids).astype(np.int32)
  g_np = rng.randn(n_ids, dim).astype(np.float32)
  # make some duplicate ids and some zero grads
  ids_np[:50] = ids_np[50:100]
  plain = jnp.asarray(w_np)
  packed = jnp.asarray(pack_table_host(w_np, meta))
  tmat = _lane_gather_matrix(meta)
  ids = jnp.asarray(ids_np)
  grads = jnp.asarray(g_np)
  f_err = float(jnp.max(jnp.abs(
      fwd_plain(plain, ids) - fwd_packed(packed, ids, meta, tmat))))
  lr, step = jnp.float32(0.1), jnp.int32(3)
  pw, pm, pv = adam_update_plain(plain, jnp.zeros_like(plain),
                                 jnp.zeros_like(plain), ids, grads,
                                 rows - 1, lr, step)
  on_tpu = jax.default_backend() == 'tpu'
  qw, qm, qv = adam_update_packed(
      packed, jnp.zeros_like(packed), jnp.zeros_like(packed), ids, grads,
      meta, lr, step, use_pallas=on_tpu)
  all_ids = jnp.arange(rows, dtype=jnp.int32)
  u_err = max(
      float(jnp.max(jnp.abs(jnp.take(px, all_ids, axis=0) -
                            fwd_packed(qx, all_ids, meta, tmat))))
      for px, qx in ((pw, qw), (pm, qm), (pv, qv)))
  print(f'  parity dim={dim}: fwd {f_err:.2e}  adam(all rows+slots) '
        f'{u_err:.2e}  (pallas={on_tpu})')
  assert f_err < 1e-6 and u_err < 1e-5


def main():
  rows = 26_000_000
  n_ids = 4096 * 26
  key = jax.random.PRNGKey(0)
  print('parity checks (small scale):')
  check_parity(16)
  check_parity(1)
  check_parity(8)

  for dim, tag in ((16, 'deep'), (1, 'wide')):
    meta = PackMeta(rows, dim)
    print(f'--- {tag}: [{rows}, {dim}] pack={meta.pack} W={meta.width} '
          f'group_rows={meta.group_rows} groups={meta.groups}')
    ids = jax.random.randint(key, (n_ids,), 0, rows, jnp.int32)
    grads = jax.random.normal(key, (n_ids, dim), jnp.float32)
    lr = jnp.float32(1e-3)
    step = jnp.int32(10)
    tmat = _lane_gather_matrix(meta)

    # --- plain layout phase ------------------------------------------
    mk_plain = jax.jit(lambda k: jax.random.normal(
        k, (rows, dim), jnp.float32) * 0.01)
    plain = mk_plain(key)
    t_f0 = time_simple(jax.jit(fwd_plain), plain, ids)
    print(f'  fwd plain take      : {t_f0*1e3:8.2f} ms')
    m0, v0 = jnp.zeros_like(plain), jnp.zeros_like(plain)
    u0 = jax.jit(functools.partial(adam_update_plain, scratch=rows - 1,
                                   lr=lr, step=step),
                 donate_argnums=(0, 1, 2))
    t_u0, st = time_threaded(u0, (plain, m0, v0), (ids, grads), iters=10)
    print(f'  upd plain 3xscatter : {t_u0*1e3:8.2f} ms')
    del plain, m0, v0, st

    # --- packed layout phase -----------------------------------------
    mk_packed = jax.jit(lambda k: jax.random.normal(
        k, (meta.groups * 8, meta.width), jnp.float32) * 0.01)
    packed = mk_packed(key)
    t_f1 = time_simple(
        jax.jit(functools.partial(fwd_packed, meta=meta, tmat=tmat)),
        packed, ids)
    print(f'  fwd packed select   : {t_f1*1e3:8.2f} ms')
    m_p, v_p = jnp.zeros_like(packed), jnp.zeros_like(packed)
    u1 = jax.jit(functools.partial(adam_update_packed, meta=meta, lr=lr,
                                   step=step, use_pallas=True),
                 donate_argnums=(0, 1, 2))
    t_u1, st = time_threaded(u1, (packed, m_p, v_p), (ids, grads),
                             iters=10)
    print(f'  upd packed pallas   : {t_u1*1e3:8.2f} ms')
    del packed, m_p, v_p, st


if __name__ == '__main__':
  main()
