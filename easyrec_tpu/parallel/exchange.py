"""Owner-routed id/vector exchange over the device mesh.

The TPU-native analog of the reference's EmbeddingParallel
`hvd.alltoall` id/vector exchange (compat/feature_column/
feature_column.py:248-357): embedding-table rows are sharded
contiguously over all mesh devices; each device's (deduplicated,
sorted) ids are grouped by owner shard and travel by
`lax.ragged_all_to_all` — wire bytes per device scale with OWNED rows,
independent of world size. XLA:CPU has no ragged-all-to-all thunk, so
test meshes run the identical routing math over an emulated collective
(all-gather + masked replay — semantics pinned by the parity tests).

Used by the packed sparse update (optim/sparse.py) and the EP forward
pull (ops/embedding.py ep_pull_sharded).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


def exchange_mode(mesh) -> str:
  """'a2a' | 'a2a_emulated' | 'allgather' (EASYREC_PACKED_EXCHANGE)."""
  mode = os.environ.get('EASYREC_PACKED_EXCHANGE', '')
  if mode:
    return mode
  platform = mesh.devices.flat[0].platform
  return 'a2a' if platform == 'tpu' else 'a2a_emulated'


def capacity_rows(n_loc: int, n_dev: int, live_owners: int = 0) -> int:
  """Owner-side exchange buffer rows.

  The worst case is n_loc * n_dev (every shard's uniques owned by one
  device) — that weak-scales terribly: at a fixed PER-CHIP batch the
  buffer grows linearly with world size (4096 rows/chip x 26 feats x
  256 chips ~ 27M rows ~ 1.7 GB at dim 16). The expected per-owner load
  is n_loc * n_dev / live_owners: each device sends <= n_loc rows, and
  hashing spreads hot rows uniformly over the row space — but only the
  `live_owners` shards that hold REAL rows receive any (small tables'
  padded packed geometry concentrates real rows in the first shards).
  The default buffer is EASYREC_EXCHANGE_CAP_FACTOR x that expectation
  (slack for load imbalance); for big production tables live_owners ==
  n_dev and the buffer is independent of world size — the standard
  capacity-bounded DLRM exchange design. Rows past an owner's capacity
  are DROPPED and COUNTED (Route.overflow, surfaced as a train metric):
  a dropped id pulls a zero vector / skips one step's gradient update.
  Set the factor to 0 to restore the unbounded worst-case buffers.
  """
  factor = float(os.environ.get('EASYREC_EXCHANGE_CAP_FACTOR', '2'))
  if factor <= 0:
    return n_loc * n_dev
  live_owners = min(max(live_owners, 1), n_dev) if live_owners else n_dev
  cap = int(-(-factor * n_loc * n_dev / live_owners // 8) * 8)
  return max(8, min(cap, n_loc * n_dev))


def ragged_a2a(operand, out, input_offsets, send_sizes, output_offsets,
               recv_sizes, axes, emulate: bool, n_dev: int):
  """lax.ragged_all_to_all, or a semantically-identical emulation for
  backends without the ragged-all-to-all HLO (XLA:CPU). The emulation
  all-gathers the operand and replays every source's sends locally with
  masked scatters — test-only traffic, identical routing semantics."""
  if not emulate:
    return jax.lax.ragged_all_to_all(
        operand, out, input_offsets, send_sizes, output_offsets,
        recv_sizes, axis_name=axes)
  me = jax.lax.axis_index(axes)
  op_all = jax.lax.all_gather(operand, axes)             # [W, n_loc, ...]
  io_all = jax.lax.all_gather(input_offsets, axes)       # [W, W]
  ss_all = jax.lax.all_gather(send_sizes, axes)          # [W, W]
  oo_all = jax.lax.all_gather(output_offsets, axes)      # [W, W]
  n_loc = operand.shape[0]
  cap = out.shape[0]
  # dump slot: invalid writes land past the live region and are sliced off
  buf = jnp.concatenate([out, jnp.zeros((1,) + out.shape[1:], out.dtype)])
  pos_in = jnp.arange(n_loc, dtype=jnp.int32)
  for s in range(n_dev):
    start = io_all[s, me]
    size = ss_all[s, me]
    dst0 = oo_all[s, me]
    src = jnp.take(op_all[s], (start + pos_in) % n_loc, axis=0)
    valid = pos_in < size
    dst = jnp.where(valid, dst0 + pos_in, cap)
    buf = buf.at[dst].set(src.astype(buf.dtype))
  return buf[:cap]


class Route(NamedTuple):
  """Static-shape routing state of one owner-partitioned exchange."""
  input_offsets: jnp.ndarray   # [W] my per-owner chunk starts (sorted ids)
  send_sizes: jnp.ndarray      # [W] my per-owner chunk sizes (clamped)
  output_offsets: jnp.ndarray  # [W] where my chunks land at each owner
  recv_sizes: jnp.ndarray      # [W] what each source sends me (clamped)
  io_all: jnp.ndarray          # [W, W] everyone's input_offsets
  sizes_mat: jnp.ndarray       # [W, W] sizes_mat[s, t] = s sends t (clamped)
  offs_mat: jnp.ndarray        # [W, W] offs_mat[s, t] = s's chunk start at t
  me: jnp.ndarray
  cap: int                     # owner-side buffer rows
  n_loc: int                   # requester-side rows
  overflow: jnp.ndarray        # scalar i32: rows targeting ME that were
  #                              dropped by the capacity clamp


def build_route(uids_sorted: jnp.ndarray, local_rows: int, n_dev: int,
                axes, cap: int = None) -> Route:
  """Routing for a SORTED unique-id list (padding = out-of-range ids at
  the tail: owner index n_dev -> sent nowhere). One searchsorted + one
  tiny [W] all-gather.

  cap bounds the OWNER-side buffer (see capacity_rows): every sender's
  chunk keeps its raw landing offset (sum of earlier senders' RAW
  sizes), and chunks that would end past cap are truncated — the clamp
  is computed identically on every device from the all-gathered size
  matrix, so both exchange legs agree. Dropped rows are counted in
  Route.overflow. cap=None keeps the unbounded n_loc * n_dev buffer."""
  n_loc = uids_sorted.shape[0]
  bounds = jnp.arange(n_dev + 1, dtype=jnp.int32) * local_rows
  edges = jnp.searchsorted(uids_sorted, bounds).astype(jnp.int32)
  input_offsets = edges[:-1]
  send_sizes = edges[1:] - edges[:-1]
  sizes_raw = jax.lax.all_gather(send_sizes, axes)          # [W, W]
  io_all = jax.lax.all_gather(input_offsets, axes)          # [W, W]
  me = jax.lax.axis_index(axes)
  offs_mat = jnp.cumsum(sizes_raw, axis=0) - sizes_raw      # sum s'<s
  if cap is None or cap >= n_loc * n_dev:
    cap = n_loc * n_dev
    sizes_mat = sizes_raw
    overflow = jnp.zeros((), jnp.int32)
  else:
    sizes_mat = jnp.clip(cap - offs_mat, 0, sizes_raw).astype(jnp.int32)
    overflow = jnp.sum(sizes_raw[:, me] - sizes_mat[:, me]).astype(
        jnp.int32)
  recv_sizes = sizes_mat[:, me].astype(jnp.int32)
  # zero-size chunks may carry an out-of-buffer raw offset; pin them to 0
  output_offsets = jnp.where(sizes_mat[me, :] > 0, offs_mat[me, :],
                             0).astype(jnp.int32)
  return Route(input_offsets, sizes_mat[me, :].astype(jnp.int32),
               output_offsets, recv_sizes, io_all, sizes_mat, offs_mat,
               me, cap=int(cap), n_loc=n_loc, overflow=overflow)


def send_to_owners(route: Route, values, fill, axes, emulate: bool,
                   n_dev: int):
  """Requester -> owner leg: values [n_loc, ...] grouped by owner (the
  sorted-unique order) -> [cap, ...] at owners; untouched slots = fill."""
  out = jnp.full((route.cap,) + values.shape[1:], fill, values.dtype)
  return ragged_a2a(values, out, route.input_offsets, route.send_sizes,
                    route.output_offsets, route.recv_sizes, axes,
                    emulate, n_dev)


def return_to_requesters(route: Route, values, axes, emulate: bool,
                         n_dev: int):
  """Owner -> requester leg (reverse routing): values [cap, ...] laid
  out source-by-source (as send_to_owners delivered them, at RAW
  landing offsets) -> [n_loc, ...] back in each requester's
  sorted-unique order. Capacity-dropped rows stay zero."""
  input_offsets_r = route.offs_mat[:, route.me].astype(jnp.int32)
  send_sizes_r = route.sizes_mat[:, route.me].astype(jnp.int32)
  input_offsets_r = jnp.where(send_sizes_r > 0, input_offsets_r, 0)
  # where my chunk starts in requester t's buffer = t's own chunk start
  # for owner me (its forward input_offsets[me])
  output_offsets_r = route.io_all[:, route.me].astype(jnp.int32)
  recv_sizes_r = route.send_sizes.astype(jnp.int32)
  out = jnp.zeros((route.n_loc,) + values.shape[1:], values.dtype)
  return ragged_a2a(values, out, input_offsets_r, send_sizes_r,
                    output_offsets_r, recv_sizes_r, axes, emulate, n_dev)
