"""EXPERIMENTAL (not wired): packed-table sparse update — round-2 work.

Status 2026-08-16: the group-DMA push kernel below is VALIDATED standalone
(benchmarks/bench_pallas_group_dma.py: 9.9 ms for 96k group RMWs, 2.4 GB
moved, vs 34.5 ms for XLA's three scatters), and the lane-aligned group
prep avoids every tile-padding trap. What blocks end-to-end adoption:
the forward-path VALUE GATHER from the packed [groups, 8, width] layout.
Every gather formulation measured SLOWER than the plain jnp.take from a
[rows, dim] table (0.7 ms):
  - 3-D gather slice (1,1,dim) with dynamic lane offset: ~987 ms
  - 2-D view gather slice (1,dim) at dynamic column offsets: worse
XLA lowers dynamic-minor-dim gathers through a slow path. Options for
round 2: (a) a Pallas gather kernel (group DMA + lane select on VPU),
(b) keep values UNPACKED [rows, dim] for gathers and only pack the
optimizer slots (update kernel then does 1 unaligned value write per
row — needs Mosaic sub-row DMA), (c) pitch the forward gather through
the same group-DMA kernel with VMEM lane selection.

Original docstring follows.
"""

"""Pallas TPU kernel for the sparse embedding optimizer update over the
packed [groups, 8, width] layout.

XLA's TPU scatter serializes per updated row (~108 ns/row + ~4 GB/s
effective write bandwidth): updating 106k rows of a 26M x 16 Adam table
costs 34.5 ms/step across its three scatters (table + m + v) — the whole
train step's wall. This kernel instead:

  1. dedups ids at the GROUP level (one group = 8 physical rows =
     pack*8 logical rows; groups are the lane/sublane-aligned DMA unit
     Mosaic requires),
  2. turns per-id gradients into per-group dense gradient blocks with a
     sorted segment-sum (no scatter),
  3. per grid step, DMA-pulls 512 groups HBM->VMEM, runs the optimizer
     math vectorized on the VPU (touched lanes only — untouched lanes
     keep their bytes), and DMA-pushes them back. The table is aliased
     in place, so donation still works.

Measured on v5e: 9.9 ms for 96k groups (2.4 GB moved, ~240 GB/s) vs
34.5 ms for XLA's scatters — and this includes the optimizer math that
the scatters don't.

Correctness:
  - group ids are unique except the padding tail, which targets the
    exclusive sacrificial scratch group with zero gradients; its
    duplicate writes carry identical bytes.
  - "touched" lanes are lanes with a nonzero summed gradient; a touched
    row whose gradients cancel to exactly 0 skips its moment decay
    (indistinguishable in practice, and the reference's lazy optimizers
    only see rows present in IndexedSlices anyway).
  - chunks run sequentially (TPU grid) and each waits for its
    write-backs, so cross-chunk hazards cannot occur.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

GROUPS_PER_STEP = 512          # 512 groups x [8, width<=1536] fits VMEM
_SUB, _LANE = 8, 64            # SMEM block shape for group ids


def _group_prep(uids, ug, meta):
  """(sorted unique logical uids, grads [n, dim]) -> (unique group ids
  [n], dense group grads [n, 8, pack*dim]).

  EVERY intermediate keeps a lane axis that is a multiple of 128
  (pack*dim = 128*dim/gcd(combined_cols,128)) — trailing-narrow arrays
  like [n*group_rows, dim] tile-pad up to 128/dim-fold on TPU and turn
  this prep into gigabytes of traffic."""
  n = uids.shape[0]
  group_rows = meta.group_rows
  pack, dim = meta.pack, meta.dim
  gids = uids // group_rows
  within = uids % group_rows
  sub = within // pack                       # physical sublane [0, 8)
  lane = within % pack                       # logical lane in the row
  first = jnp.concatenate([jnp.ones((1,), bool), gids[1:] != gids[:-1]])
  gseg = jnp.cumsum(first) - 1
  scratch_gid = meta.scratch // group_rows
  ugids = jnp.full((n,), scratch_gid, gids.dtype).at[gseg].set(gids)

  # expand each update's grad into its lane slot of a [pack*dim] row
  tiled = jnp.tile(ug.astype(jnp.float32), (1, pack))   # [n, pack*dim]
  col = jnp.arange(pack * dim)
  expanded = jnp.where((col // dim)[None, :] == lane[:, None], tiled, 0.0)
  # uids sorted => (gseg, sub) non-decreasing => flat index sorted;
  # collisions (two lanes in the same physical row) sum, which is exact
  # because their lane slots are disjoint
  flat = gseg * 8 + sub
  group_g = jax.ops.segment_sum(expanded, flat, num_segments=n * 8,
                                indices_are_sorted=True)
  return ugids, group_g.reshape(n, 8, pack * dim)


import numpy as _np


def _part_columns(meta):
  """Static lane-index vectors: columns of part s (0=weights, 1..=slots)
  inside one physical row, plus the inverse permutation that reassembles
  a physical row from the concatenated parts. All shuffles along the
  lane axis stay 128-friendly — NO narrow [*, C] reshapes, which would
  tile-pad catastrophically (a [163M, 3] f32 intermediate = 83 GB)."""
  c, pack, dim = meta.combined_cols, meta.pack, meta.dim
  n_parts = c // dim
  parts = []
  for s in range(n_parts):
    cols = _np.add.outer(_np.arange(pack) * c + s * dim,
                         _np.arange(dim)).reshape(-1)
    parts.append(cols)
  order = _np.concatenate(parts)               # part-major column order
  inverse = _np.argsort(order)
  return parts, inverse


def _update_groups(rows, group_g, optimizer, lr, step, meta):
  """rows [n, 8, width] pulled groups -> updated groups (same shape).

  group_g: [n, 8, pack*dim] dense per-physical-row gradients (zero =
  untouched lane). All math runs on [n*8, pack*dim] lane-aligned views —
  no narrow reshapes (see _group_prep)."""
  n = rows.shape[0]
  parts_idx, inverse_idx = _part_columns(meta)
  rows2 = rows.reshape(n * 8, meta.width).astype(jnp.float32)
  g = group_g.reshape(n * 8, meta.pack * meta.dim)
  w = jnp.take(rows2, jnp.asarray(parts_idx[0]), axis=1)
  slots = [jnp.take(rows2, jnp.asarray(idx), axis=1)
           for idx in parts_idx[1:]]
  w_new, slots_new = optimizer.update_parts(w, slots, g, lr, step)
  # touched lane = any nonzero grad component in its dim-block; computed
  # lane-aligned via a static block-diagonal matmul instead of a narrow
  # [., pack, dim] reshape
  block = _np.kron(_np.eye(meta.pack, dtype=_np.float32),
                   _np.ones((meta.dim, meta.dim), _np.float32))
  nz = (g != 0.0).astype(jnp.float32)
  touched = (nz @ jnp.asarray(block)) > 0.0
  w_new = jnp.where(touched, w_new, w)
  slots_new = [jnp.where(touched, s_new, s_old)
               for s_new, s_old in zip(slots_new, slots)]
  merged = jnp.concatenate([w_new] + slots_new, axis=1)
  out = jnp.take(merged, jnp.asarray(inverse_idx), axis=1)
  return out.reshape(n, 8, meta.width).astype(rows.dtype)


def _take_groups(table, ugids, meta):
  """[n] group ids -> [n, 8, width] via a 2-D sliced gather (one [8, W]
  slice per group; faster lowering than 3-D take)."""
  flat = table.reshape(-1, meta.width)
  dnums = jax.lax.GatherDimensionNumbers(
      offset_dims=(1, 2), collapsed_slice_dims=(),
      start_index_map=(0,))
  return jax.lax.gather(flat, (ugids * 8)[:, None], dnums,
                        (8, meta.width), mode='clip')


def _xla_apply(table, ugids, group_g, optimizer, lr, step, meta):
  rows = _take_groups(table, ugids, meta)          # [n, 8, width]
  new_rows = _update_groups(rows, group_g, optimizer, lr, step, meta)
  new_rows, ugids = jax.lax.optimization_barrier((new_rows, ugids))
  return table.at[ugids].set(new_rows)


def _pallas_apply(table, ugids, group_g, optimizer, lr, step, meta):
  """XLA gathers the groups and runs the optimizer math (reshapes across
  the lane axis don't lower in Mosaic); the Pallas kernel does the part
  XLA cannot do fast — the scattered group write-back via per-group DMA
  (one aligned [1, 8, width] copy per touched group)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  rows = _take_groups(table, ugids, meta)          # [n, 8, width]
  new_rows = _update_groups(rows, group_g, optimizer, lr, step, meta)

  n = ugids.shape[0]
  # groups per grid step, bounded by ~6 MB of VMEM for the row block
  chunk = min(GROUPS_PER_STEP,
              max(_LANE, (6 << 20) // (8 * meta.width * 4) // _LANE *
                  _LANE))
  pad = (-n) % chunk
  if pad:
    scratch_gid = meta.scratch // meta.group_rows
    ugids = jnp.concatenate(
        [ugids, jnp.full((pad,), scratch_gid, ugids.dtype)])
    # padding rows re-write the scratch group with its CURRENT bytes so
    # duplicate writes stay identical
    scratch_rows = jnp.broadcast_to(table[scratch_gid][None],
                                    (pad, 8, meta.width))
    new_rows = jnp.concatenate([new_rows, scratch_rows.astype(
        new_rows.dtype)])
  n_pad = ugids.shape[0]
  ugids2 = ugids.astype(jnp.int32).reshape(n_pad // _LANE, _LANE)

  def kernel(gid_ref, rows_ref, tbl_ref, out_ref, sem_out):
    def push(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(rows_ref.at[i], out_ref.at[rid],
                            sem_out).start()
      return 0

    def push_wait(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(rows_ref.at[i], out_ref.at[rid],
                            sem_out).wait()
      return 0

    jax.lax.fori_loop(0, chunk, push, 0)
    jax.lax.fori_loop(0, chunk, push_wait, 0)

  fn = pl.pallas_call(
      kernel,
      grid=(n_pad // chunk,),
      in_specs=[
          pl.BlockSpec((chunk // _LANE, _LANE),
                       lambda i: (i, 0), memory_space=pltpu.SMEM),
          pl.BlockSpec((chunk, 8, meta.width), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),               # table HBM
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
      scratch_shapes=[pltpu.SemaphoreType.DMA],
      input_output_aliases={2: 0},
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
  )
  return fn(ugids2, new_rows, table)


def apply_group_updates(table, uids, ug, optimizer, lr, step, meta,
                        use_pallas: Optional[bool] = None):
  """Update the touched logical rows of one packed combined table.

  uids: sorted, deduplicated logical ids (scratch-row padded); ug their
  summed gradients [n, dim]; meta the FusedTable layout.
  """
  if use_pallas is None:
    use_pallas = (jax.default_backend() == 'tpu' and
                  os.environ.get('EASYREC_DISABLE_PALLAS', '') != '1')
  ugids, group_g = _group_prep(uids, ug, meta)
  if use_pallas:
    return _pallas_apply(table, ugids, group_g, optimizer, lr, step, meta)
  return _xla_apply(table, ugids, group_g, optimizer, lr, step, meta)
