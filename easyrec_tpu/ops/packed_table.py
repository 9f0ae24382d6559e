"""Packed embedding-table layout + Mosaic RMW update kernel.

The XLA TPU scatter serializes per updated row (~108 ns/row, ~4 GB/s
effective write BW — PERF.md): the three Adam scatters on the flagship
bench cost 44 ms of an 85 ms step. This module stores each table-shaped
array (weights and every optimizer slot) in a PACKED geometry where the
sparse update becomes per-GROUP aligned DMAs inside one Pallas kernel:

  logical [rows, dim]  ->  packed [G*8, W],  W = lcm(dim, 128)
  row r lives at physical row  (r // group_rows) * 8 + (r % group_rows)
  // pack, lane columns [l*dim, (l+1)*dim) with l = r % pack,
  pack = W // dim, group_rows = 8 * pack.

One GROUP = 8 consecutive physical rows = group_rows logical rows =
the smallest slice Mosaic DMA accepts (lane-aligned width % 128 == 0 AND
sublane-aligned start/size % 8 == 0 — PERF.md "Mosaic alignment").

Forward gather stays in XLA: a plain physical-row take (dynamic MAJOR
offsets lower fast; dynamic MINOR offsets are the 180-1000x trap) + a
one-hot lane mask + a static 0/1 matmul back to [N, dim]. Measured
FASTER than the plain-layout take (3.9 ms vs 5.2 ms at bench shapes).

Sparse update: sorted-dedup (optim/sparse.py) -> group-level dedup with
lane expansion (everything 128-lane aligned; narrow [., pack, dim]
reshapes tile-pad catastrophically) -> ONE pallas kernel that, per grid
chunk, DMA-pulls the touched groups of EVERY array (weights + slots),
runs the optimizer math on the VPU with a touched-row mask, and
DMA-pushes them back (~240 GB/s vs the scatter's 4 GB/s). XLA's
[8, W]-slice gather was measured at 145 ms per array at bench shapes —
group pulls MUST live inside the kernel.

Reference parity: this replaces the IndexedSlices sparse-apply path of
easy_rec/python/compat/optimizers.py:294-316 (lazy/async optimizers);
numerics are bit-exact vs the plain-layout row update (validated in
benchmarks/bench_packed_v2.py and tests/test_packed_table.py).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Widest physical row the kernel will handle: bounds VMEM use
# (chunk * 8 * W * 4 bytes per buffered array) and covers every
# power-of-two dim plus dims like 24/48/96 (W=384). Odd dims whose
# lcm(dim, 128) exceeds this fall back to the plain layout.
MAX_WIDTH = 512
_LANE = 64          # SMEM id-block lane count


class PackMeta:
  """Static geometry of one packed table."""

  def __init__(self, rows: int, dim: int):
    self.rows = int(rows)
    self.dim = int(dim)
    self.pack = 128 // math.gcd(dim, 128)
    self.width = self.pack * dim                  # lcm(dim, 128)
    self.group_rows = 8 * self.pack
    # +1 group so the scratch row never shares a group with real rows,
    # +rounding; scratch group absorbs dedup padding writes
    self.groups = rows // self.group_rows + 2
    self.rows_padded = self.groups * self.group_rows
    self.scratch = self.rows_padded - self.group_rows
    self.scratch_gid = self.groups - 1
    self.phys_rows = self.groups * 8

  def __repr__(self):
    return ('PackMeta(rows=%d, dim=%d, pack=%d, width=%d, groups=%d)'
            % (self.rows, self.dim, self.pack, self.width, self.groups))


def supported(dim: int) -> bool:
  return (128 // math.gcd(dim, 128)) * dim <= MAX_WIDTH


# ------------------------------------------------------------------ host

def pack_host(table: np.ndarray, meta: PackMeta) -> np.ndarray:
  """[rows, dim] -> [G*8, W] on host (free of TPU relayout traps)."""
  full = np.zeros((meta.rows_padded, meta.dim), table.dtype)
  full[:table.shape[0]] = table
  v = full.reshape(meta.groups, 8, meta.pack, meta.dim)
  return np.ascontiguousarray(v.reshape(meta.phys_rows, meta.width))


def unpack_host(packed: np.ndarray, meta: PackMeta,
                rows: int = None) -> np.ndarray:
  """[G*8, W] -> [rows, dim] on host."""
  v = packed.reshape(meta.groups, 8, meta.pack, meta.dim)
  flat = v.reshape(meta.rows_padded, meta.dim)
  return np.ascontiguousarray(flat[:rows if rows is not None
                                   else meta.rows])


# --------------------------------------------------------------- forward

def phys_index(ids: jnp.ndarray, meta: PackMeta):
  """logical id -> (physical row, lane)."""
  g = ids // meta.group_rows
  within = ids % meta.group_rows
  return g * 8 + within // meta.pack, within % meta.pack


@functools.lru_cache(maxsize=None)
def _lane_sum_matrix(width: int, dim: int):
  t = np.zeros((width, dim), np.float32)
  for j in range(width):
    t[j, j % dim] = 1.0
  return t


def pull(packed: jnp.ndarray, ids: jnp.ndarray,
         meta: PackMeta) -> jnp.ndarray:
  """Gather logical rows [..., dim] from the packed array (pure XLA).

  Physical-row take + one-hot lane mask + static 0/1 matmul; the matmul
  must run at HIGHEST precision to keep f32 mantissas (TPU matmuls
  default to bf16)."""
  shape = ids.shape
  flat = ids.reshape(-1)
  prow, lane = phys_index(flat, meta)
  r = jnp.take(packed, prow, axis=0)                      # [N, W]
  col_lane = jnp.arange(meta.width, dtype=jnp.int32) // meta.dim
  mask = (col_lane[None, :] == lane[:, None]).astype(r.dtype)
  tmat = jnp.asarray(_lane_sum_matrix(meta.width, meta.dim)).astype(r.dtype)
  out = jax.lax.dot(r * mask, tmat,
                    precision=jax.lax.Precision.HIGHEST)  # [N, dim]
  return out.reshape(shape + (meta.dim,))


# ----------------------------------------------------------- update prep

def group_prep(uids: jnp.ndarray, ug: jnp.ndarray, meta: PackMeta):
  """Sorted deduped logical ids + summed grads [n, dim] -> unique group
  ids [n] and dense per-physical-row grad blocks [n, 8, W].

  Padding slots target the scratch group with zero gradients (same
  contract as optim/sparse.dedup_sum). Every intermediate keeps a
  128-multiple lane axis — narrow [*, dim] reshapes tile-pad on TPU."""
  n = uids.shape[0]
  gids = uids // meta.group_rows
  within = uids % meta.group_rows
  sub = within // meta.pack
  lane = within % meta.pack
  first = jnp.concatenate([jnp.ones((1,), bool), gids[1:] != gids[:-1]])
  gseg = jnp.cumsum(first) - 1
  ugids = jnp.full((n,), meta.scratch_gid,
                   gids.dtype).at[gseg].set(gids)
  tiled = jnp.tile(ug.astype(jnp.float32), (1, meta.pack))   # [n, W]
  col = jnp.arange(meta.width) // meta.dim
  expanded = jnp.where(col[None, :] == lane[:, None], tiled, 0.0)
  # uids sorted => (gseg, sub) sorted => flat sorted; same-(group,sub)
  # collisions sum exactly (disjoint lane slots after dedup)
  flat = gseg * 8 + sub
  gg = jax.ops.segment_sum(expanded, flat, num_segments=n * 8,
                           indices_are_sorted=True)
  return ugids, gg.reshape(n, 8, meta.width)


@functools.lru_cache(maxsize=None)
def _touch_matrix(width: int, dim: int):
  """Block-diagonal kron(I_pack, ones(dim,dim)): row-level touched mask
  from per-element nonzeros without narrow reshapes."""
  pack = width // dim
  return np.kron(np.eye(pack, dtype=np.float32),
                 np.ones((dim, dim), np.float32))


# --------------------------------------------------------------- kernel

def _rmw_pallas(arrays: Tuple[jnp.ndarray, ...],
                ugids: jnp.ndarray,
                gg: jnp.ndarray,
                hypers: jnp.ndarray,
                math_fn: Callable,
                meta: PackMeta,
                interpret: bool = False):
  """One grid pass: pull touched groups of every array, run math_fn on
  the VPU, push them back. arrays are input/output-aliased (donate the
  callers' buffers for true in-place RMW)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n = ugids.shape[0]
  n_arr = len(arrays)
  w = meta.width
  # VMEM: n_arr scratch bufs + double-buffered gg block + ~3 block-sized
  # math temporaries (nz/touched/news), all chunk*8*W*4, within the 16 MB
  # scoped-vmem stack (measured 16.8 MB at chunk=512/n_arr=3 — keep
  # headroom)
  per_chunk = 8 * w * 4
  chunk = max(_LANE, min(512, (12 << 20) // ((n_arr + 5) * per_chunk)
                         // _LANE * _LANE))
  pad = (-n) % chunk
  if pad:
    ugids = jnp.concatenate(
        [ugids, jnp.full((pad,), meta.scratch_gid, ugids.dtype)])
    gg = jnp.concatenate(
        [gg, jnp.zeros((pad, 8, w), gg.dtype)])
  n_pad = ugids.shape[0]
  # ids live in SMEM as one fixed (8, 64)-slot page per grid step (SMEM
  # blocks must keep 8/128-divisible trailing dims); only the first
  # `chunk` slots of a page are used
  nc = n_pad // chunk
  gid_page = jnp.full((nc, 8 * _LANE), meta.scratch_gid, jnp.int32)
  gid_page = gid_page.at[:, :chunk].set(
      ugids.astype(jnp.int32).reshape(nc, chunk))
  gid3 = gid_page.reshape(nc, 8, _LANE)
  arrays3 = [a.reshape(meta.groups, 8, w) for a in arrays]
  touch_m = jnp.asarray(_touch_matrix(w, meta.dim))

  def kernel(*refs):
    gid_ref, gg_ref, hyp_ref, tm_ref = refs[:4]
    in_tbls = refs[4:4 + n_arr]
    out_tbls = refs[4 + n_arr:4 + 2 * n_arr]
    bufs = refs[4 + 2 * n_arr:4 + 3 * n_arr]
    sem_in, sem_out = refs[-2:]
    del in_tbls  # aliased with out_tbls; all access goes through out
    hyp = lambda k: hyp_ref[0, k]   # SMEM scalar reads  # noqa: E731

    def dma(i, buf, k, out=False):
      rid = gid_ref[0, i // _LANE, i % _LANE]
      if out:
        return pltpu.make_async_copy(buf.at[i], out_tbls[k].at[rid],
                                     sem_out)
      return pltpu.make_async_copy(out_tbls[k].at[rid], buf.at[i],
                                   sem_in)

    for k, buf in enumerate(bufs):
      jax.lax.fori_loop(0, chunk,
                        lambda i, _, b=buf, k=k: (dma(i, b, k).start(), 0)[1],
                        0)
    for k, buf in enumerate(bufs):
      jax.lax.fori_loop(0, chunk,
                        lambda i, _, b=buf, k=k: (dma(i, b, k).wait(), 0)[1],
                        0)

    g = gg_ref[:].reshape(chunk * 8, w)
    nz = (g != 0.0).astype(jnp.float32)
    touched = jax.lax.dot(nz, tm_ref[:],
                          precision=jax.lax.Precision.HIGHEST) > 0.0
    olds = [b[:].reshape(chunk * 8, w).astype(jnp.float32) for b in bufs]
    news = math_fn(olds, g, hyp)
    for k, buf in enumerate(bufs):
      merged = jnp.where(touched, news[k], olds[k])
      buf[:] = merged.reshape(chunk, 8, w).astype(buf.dtype)

    for k, buf in enumerate(bufs):
      jax.lax.fori_loop(
          0, chunk,
          lambda i, _, b=buf, k=k: (dma(i, b, k, out=True).start(), 0)[1],
          0)
    for k, buf in enumerate(bufs):
      jax.lax.fori_loop(
          0, chunk,
          lambda i, _, b=buf, k=k: (dma(i, b, k, out=True).wait(), 0)[1],
          0)

  grid = (n_pad // chunk,)
  fn = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=(
          [pl.BlockSpec((1, 8, _LANE), lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((chunk, 8, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((8, _LANE), lambda i: (0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((w, w), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] +
          [pl.BlockSpec(memory_space=pl.ANY)] * n_arr),
      out_specs=tuple(
          pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_arr)),
      out_shape=tuple(
          jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays3),
      scratch_shapes=(
          [pltpu.VMEM((chunk, 8, w), jnp.float32)
           for _ in range(n_arr)] +
          [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]),
      input_output_aliases={4 + k: k for k in range(n_arr)},
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )
  outs = fn(gid3, gg, hypers, touch_m, *arrays3)
  return tuple(o.reshape(meta.phys_rows, w) for o in outs)


def _rmw_xla(arrays, ugids, gg, hypers, math_fn, meta):
  """Reference/fallback path (CPU tests, unsupported backends): XLA
  group gather + math + group .set. Numerics identical to the kernel."""
  dnums = jax.lax.GatherDimensionNumbers(
      offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
  n = ugids.shape[0]
  w = meta.width
  olds = [jax.lax.gather(a, (ugids * 8)[:, None], dnums, (8, w),
                         mode='clip').astype(jnp.float32)
          .reshape(n * 8, w) for a in arrays]
  g = gg.reshape(n * 8, w)
  nz = (g != 0.0).astype(jnp.float32)
  touched = jax.lax.dot(nz, jnp.asarray(_touch_matrix(w, meta.dim)),
                        precision=jax.lax.Precision.HIGHEST) > 0.0
  hvec = hypers.reshape(-1)
  news = math_fn(olds, g, lambda k: hvec[k])
  outs = []
  for a, old, new in zip(arrays, olds, news):
    merged = jnp.where(touched, new, old).reshape(n, 8, w)
    a3 = a.reshape(meta.groups, 8, w)
    outs.append(a3.at[ugids].set(merged.astype(a.dtype))
                .reshape(meta.phys_rows, w))
  return tuple(outs)


def apply_packed_update(arrays: Sequence[jnp.ndarray],
                        ugids: jnp.ndarray,
                        gg: jnp.ndarray,
                        hypers: jnp.ndarray,
                        math_fn: Callable,
                        meta: PackMeta,
                        use_pallas: bool,
                        interpret: bool = False):
  """Read-modify-write the touched groups of every array.

  arrays: packed [G*8, W] buffers (weights first, then optimizer slots).
  ugids/gg: from group_prep. hypers: [K] f32 scalars for math_fn.
  math_fn(old_blocks, g_block, hyp) -> new_blocks, all [c*8, W] f32;
  hyp is a callable k -> scalar (SMEM read in the kernel).
  """
  hyp = jnp.zeros((8, _LANE), jnp.float32)
  hyp = hyp.at[0, :hypers.shape[0]].set(hypers.astype(jnp.float32))
  if use_pallas or interpret:
    return _rmw_pallas(tuple(arrays), ugids, gg, hyp, math_fn, meta,
                       interpret=interpret)
  return _rmw_xla(tuple(arrays), ugids, gg, hyp, math_fn, meta)
