"""Packed embedding-table layout + Mosaic group-RMW sparse update.

The XLA TPU scatter serializes per updated row: measured IN-STEP on the
flagship bench (benchmarks/bench_step_ablation.py), the three Adam
scatters on the [26M, 16] deep table cost ~51 ms and the [26M, 1] wide
table another ~16 ms of an 83 ms step. This module replaces them with
per-GROUP aligned DMAs inside one Pallas kernel.

Layout (v3, "combined interleaved"): the weights AND every optimizer
slot of a logical row live side by side in ONE physical row —

  combined cols  cc = n_parts * dim          (w | slot1 | slot2 ...)
  width          W  = lcm(cc, 128)
  pack           = W // cc   logical rows per physical row
  group          = 8 physical rows = 8*pack logical rows
  part p of logical row r  ->  physical row
      (r // group_rows) * 8 + (r % group_rows) // pack,
      cols  (r % pack) * cc + p*dim + [0, dim)

One group is the smallest slice Mosaic DMA accepts (lane-aligned width
% 128 == 0 AND sublane-aligned start/size % 8 == 0), and combining the
parts means ONE pull + ONE push per touched group: the kernel is
DMA-ISSUE-bound (~40-50 ns per copy, benchmarks/bench_dma_issue.py), so
per-array copies (v2) tripled the cost and lost to the scatters.

Forward gather stays in XLA: a plain physical-row take (dynamic MAJOR
offsets lower fast; dynamic MINOR offsets lower 180-1000x slow) + a
one-hot part-0 mask + a static 0/1 matmul back to [N, dim] — measured
FASTER than the plain-layout take at bench shapes (3.9 vs 5.2 ms).

Update pipeline (all scatter-free except one 1-D id set):
  sort ids -> group-level segments -> lane-expand sorted grads COMPACT
  -> ONE sorted segment-sum to [cap, 8, part_width] grad blocks (cap =
  min(n_ids, groups): small tables truncate) -> kernel: per chunk,
  DMA-pull touched groups; since part p of a row sits exactly p*dim
  lanes right of its weights, pltpu.roll(old, -p*dim) aligns every part
  to the part-0 columns and the optimizer's blockwise math
  (optim/sparse.py block_math) runs on full-width vectors unchanged —
  no per-part extract/reassemble MXU matmuls (HIGHEST-precision f32
  matmuls run at ~1/6 MXU rate and measured ~30 ms/step here); mask
  untouched rows (one bf16 block-diagonal matmul, exact for 0/1 sums);
  DMA-push back.

Measured on the flagship bench (v5e single chip, batch 4096): full
train step 83.3 ms (plain scatters) -> 40.9 ms packed = 100.1k
examples/s/chip, 2.07x.

Reference parity: replaces the IndexedSlices sparse-apply path of
easy_rec/python/compat/optimizers.py:294-316 (lazy/async optimizers);
numerics match the plain-layout row update up to f32 summation order
(tests/test_packed_table.py), with ONE documented divergence: a row
whose batch gradients sum to exactly 0.0 (e.g. sampled-negative filler
id columns, or perfectly cancelling duplicates) keeps its bytes here,
while the plain path still applies the optimizer's decay to it. The
packed behavior is the stricter lazy semantics; zero-sum rows carry no
signal either way.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Widest physical row the kernel handles: bounds VMEM (chunk*8*W*4 per
# buffered block). Every power-of-two dim with up to 3 parts lands on
# W <= 384; odd dims whose lcm exceeds this fall back to plain layout.
import os as _os

MAX_WIDTH = 512
_LANE = 64          # SMEM id-page lane count
_PAGE = 8 * _LANE   # id slots per SMEM page (fixed (1, 8, 64) block)
# DMA issue-loop unrolling (bench_dma_issue: -15% at 4) and VMEM chunk
# budget, env-tunable for kernel sweeps
def _unroll():
  return int(_os.environ.get('EASYREC_PACKED_UNROLL', 4))


def _chunk_mb():
  return int(_os.environ.get('EASYREC_PACKED_CHUNK_MB', 12))


def _gg_mode():
  # Gradient-sum buffer dtype policy. The segment-sum into gg is
  # HBM-bandwidth bound (655 MB zero-init + scattered adds at flagship
  # shapes; PERF.md r3): f32 10.02 ms, full bf16 8.18 ms, bf16-payload/
  # f32-accumulate 9.07 ms in-step. Full bf16 ALSO ACCUMULATES in bf16,
  # so hot ids with near-cancelling duplicate grads per batch could in
  # principle lose far more than the ~2^-8 payload rounding (swamping;
  # advisor r3 medium finding). VALIDATION (r4): the calibrated proxy
  # benchmark (benchmarks/quality_proxy.py — zipf ids incl 50-entry
  # vocabs whose hot rows repeat ~800x/batch, hidden-interaction labels,
  # 4M rows) measured AUC 0.64123 (bf16) vs 0.64141 (f32) vs 0.64147
  # (mix): all three within eval noise. Full bf16 is therefore the
  # default (it is also -1.2 ms/step); 'mix' (bf16 payload, f32
  # accumulation) and '0' (pure f32) remain for diagnosis.
  return _os.environ.get('EASYREC_GG_BF16', '1')


def _gg_cast(expanded):
  mode = _gg_mode()
  if mode == '1':
    return expanded.astype(jnp.bfloat16)
  if mode == 'mix':
    return expanded.astype(jnp.bfloat16).astype(jnp.float32)
  return expanded


class PackMeta:
  """Static geometry of one packed table (n_parts = 1 + optimizer
  slots).

  compact=True (2-slot optimizers, e.g. Adam) stores the two slot
  arrays as bf16 PAIRS bitcast into ONE f32 lane block: a logical row
  is [w f32 x dim | m<<16|v x dim] = 2*dim lanes instead of 3*dim.
  For dim 16 that turns width 384 into 128 — 3x less kernel traffic
  and ~40% less HBM — at the cost of bf16-rounded optimizer moments
  (weights stay full f32). n_parts below becomes the PHYSICAL part
  count (2); hosts pack/unpack still speak logical (w, m, v)."""

  def __init__(self, rows: int, dim: int, n_parts: int = 1,
               shards: int = 1, compact: bool = False):
    if compact and n_parts != 3:
      raise ValueError('compact layout packs exactly 2 slots (n_parts=3)')
    self.rows = int(rows)
    self.dim = int(dim)
    self.compact = bool(compact)
    self.logical_parts = int(n_parts)
    self.n_parts = 2 if compact else int(n_parts)
    self.shards = int(shards)
    self.cc = self.n_parts * self.dim             # combined cols / row
    self.width = self.cc * (128 // math.gcd(self.cc, 128))  # lcm(cc,128)
    self.pack = self.width // self.cc
    self.group_rows = 8 * self.pack
    # +1 whole sacrificial group at the end absorbs dedup padding;
    # groups round to a 256 multiple so the geometry — and therefore
    # checkpoints — is IDENTICAL across power-of-two pod sizes up to 256
    # devices (orbax reshards on restore). Non-power-of-two meshes lcm
    # up (their geometry is self-consistent but not interchangeable
    # with power-of-two checkpoints without a fine-tune-style splice).
    g = rows // self.group_rows + 2
    # lcm keeps groups divisible by non-power-of-two shard counts too
    # (e.g. 6- or 192-device meshes) while staying a 256 multiple
    quantum = 256 * self.shards // math.gcd(256, self.shards)
    self.groups = -(-g // quantum) * quantum
    self.rows_padded = self.groups * self.group_rows
    self.scratch = self.rows_padded - self.group_rows
    self.scratch_gid = self.groups - 1
    self.phys_rows = self.groups * 8
    # compact per-part view width (128-padded for clean MXU shapes)
    self.part_width = max(128, ((self.pack * self.dim + 127) // 128) * 128)

  def local_view(self) -> 'PackMeta':
    """Geometry of ONE row shard (groups/shards of this table): used
    inside shard_map where each device updates its local groups. The
    local scratch group is just the last local group — dedup padding and
    out-of-range clamps carry zero gradients, so their pull/push writes
    back identical bytes wherever they land."""
    m = PackMeta.__new__(PackMeta)
    m.__dict__.update(self.__dict__)
    m.shards = 1
    m.groups = self.groups // self.shards
    m.rows_padded = m.groups * m.group_rows
    m.rows = m.rows_padded
    m.scratch = m.rows_padded - m.group_rows
    m.scratch_gid = m.groups - 1
    m.phys_rows = m.groups * 8
    return m

  def __repr__(self):
    return ('PackMeta(rows=%d, dim=%d, parts=%d, width=%d, groups=%d, '
            'shards=%d%s)'
            % (self.rows, self.dim, self.n_parts, self.width,
               self.groups, self.shards,
               ', compact' if self.compact else ''))


def supported(dim: int, n_parts: int = 1, compact: bool = False) -> bool:
  cc = dim * (2 if compact and n_parts == 3 else n_parts)
  return cc * (128 // math.gcd(cc, 128)) <= MAX_WIDTH


# bf16 pair packing (host side; the kernel does the same with lax ops)

def _np_bf16_bits(x: np.ndarray) -> np.ndarray:
  """f32 -> round-to-nearest-even bf16 bits in the TOP 16 of a u32."""
  u = np.ascontiguousarray(x, np.float32).view(np.uint32)
  u = u + 0x7FFF + ((u >> 16) & 1)
  return u & np.uint32(0xFFFF0000)


def np_pack_pair(m: np.ndarray, v: np.ndarray) -> np.ndarray:
  """Two f32 arrays -> one f32 array of (bf16(m) << 16 | bf16(v))."""
  u = _np_bf16_bits(m) | (_np_bf16_bits(v) >> 16)
  return u.view(np.float32)


def np_unpack_pair(mv: np.ndarray):
  u = np.ascontiguousarray(mv, np.float32).view(np.uint32)
  m = (u & np.uint32(0xFFFF0000)).view(np.float32)
  v = (u << np.uint32(16)).view(np.float32)
  return m, v


# ------------------------------------------------------------------ host

def pack_host(weights: np.ndarray, slots: Sequence[np.ndarray],
              meta: PackMeta) -> np.ndarray:
  """(w [rows, dim], LOGICAL slot arrays [rows, dim]...) -> combined
  [G*8, W]; compact metas pack the two slots into bf16 pairs."""
  if meta.compact:
    assert len(slots) == 2, len(slots)
    slots = [np_pack_pair(slots[0], slots[1])]
  parts = [weights] + list(slots)
  assert len(parts) == meta.n_parts, (len(parts), meta.n_parts)
  full = np.zeros((meta.rows_padded, meta.cc), weights.dtype)
  for p, arr in enumerate(parts):
    full[:arr.shape[0], p * meta.dim:(p + 1) * meta.dim] = arr
  v = full.reshape(meta.groups, 8, meta.pack, meta.cc)
  return np.ascontiguousarray(v.reshape(meta.phys_rows, meta.width))


def unpack_host(packed: np.ndarray, meta: PackMeta,
                rows: int = None) -> Tuple[np.ndarray, list]:
  """combined [G*8, W] -> (weights [rows, dim], LOGICAL slot arrays);
  compact metas decode the bf16 pair part back into two slots."""
  rows = meta.rows if rows is None else rows
  v = packed.reshape(meta.groups, 8, meta.pack, meta.cc)
  flat = v.reshape(meta.rows_padded, meta.cc)[:rows]
  parts = [np.ascontiguousarray(flat[:, p * meta.dim:(p + 1) * meta.dim])
           for p in range(meta.n_parts)]
  if meta.compact:
    m, vv = np_unpack_pair(parts[1])
    return parts[0], [m, vv]
  return parts[0], parts[1:]


# --------------------------------------------------------------- forward

def phys_index(ids: jnp.ndarray, meta: PackMeta):
  """logical id -> (physical row, lane in [0, pack))."""
  g = ids // meta.group_rows
  within = ids % meta.group_rows
  return g * 8 + within // meta.pack, within % meta.pack


@functools.lru_cache(maxsize=None)
def _part0_sum_matrix(width: int, cc: int, dim: int):
  """W x dim 0/1: column j contributes to output d iff j % cc == d < dim."""
  t = np.zeros((width, dim), np.float32)
  for j in range(width):
    if j % cc < dim:
      t[j, j % cc] = 1.0
  return t


def pull(packed: jnp.ndarray, ids: jnp.ndarray,
         meta: PackMeta) -> jnp.ndarray:
  """Gather logical WEIGHT rows [..., dim] (pure XLA: phys-row take +
  lane mask + static 0/1 matmul at HIGHEST precision — TPU matmuls
  otherwise truncate f32 to bf16)."""
  shape = ids.shape
  flat = ids.reshape(-1)
  prow, lane = phys_index(flat, meta)
  r = jnp.take(packed, prow, axis=0)                      # [N, W]
  col = jnp.arange(meta.width, dtype=jnp.int32)
  mask = ((col // meta.cc)[None, :] == lane[:, None]).astype(r.dtype)
  tmat = jnp.asarray(_part0_sum_matrix(meta.width, meta.cc,
                                       meta.dim)).astype(r.dtype)
  out = jax.lax.dot(r * mask, tmat,
                    precision=jax.lax.Precision.HIGHEST)  # [N, dim]
  return out.reshape(shape + (meta.dim,))


# ----------------------------------------------------- sorted segment sum

# Block/tile sizes: the fori-loop body costs ~3-5 us of scalar-core
# overhead per iteration, so iteration count (≈ n/_SEG_T + 2*cap8/_SEG_B)
# dominates below ~1 MB of per-tile compute — bigger blocks/tiles win
# until VMEM (2*(seg_b+2*_SEG_T) rows of scratch) or the >512-group DMA
# chunk ceiling bite. Env read at TRACE time so on-TPU sweeps can vary
# them between fresh jits without re-importing.


def _seg_b():
  return int(_os.environ.get('EASYREC_SEG_SUM_B', 2048))  # gg rows/block


def _seg_t():
  return int(_os.environ.get('EASYREC_SEG_SUM_T', 256))   # in rows/tile


def _seg_stack():
  return _os.environ.get('EASYREC_SEG_SUM_STACK', '0') == '1'


def _seg_sum_pallas(expanded: jnp.ndarray, flat: jnp.ndarray,
                    cap8: int, interpret: bool = False) -> jnp.ndarray:
  """Sorted segmented sum as a Mosaic kernel: gg_flat[r] = sum of
  expanded rows whose (sorted) flat segment id == r, for r < cap8.

  XLA lowers `jax.ops.segment_sum(..., indices_are_sorted=True)` to a
  scatter-add (~108 ns/row — the scatter wall, 8.2 ms at bench shapes
  writing 436 MB at an effective 53 GB/s). Sortedness makes the output
  DENSE-SEQUENTIAL instead: one pass over output blocks of seg_b rows,
  each accumulated from its contiguous input range (per-block ranges
  precomputed with one searchsorted) via one-hot matmuls on the MXU.
  Gradients stream as bf16 hi+lo pairs (two full-speed bf16 matmuls,
  ~2^-16 relative error) instead of one 6-pass HIGHEST f32 matmul.

  Input DMAs are double-buffered two tiles ahead; output blocks are
  double-buffered and pushed with async copies, so the scalar core only
  pays ~L tile-loop iterations (L ≈ N/_SEG_T + 2*blocks)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  _SEG_B, _SEG_T, _SEG_STACK = _seg_b(), _seg_t(), _seg_stack()
  n, pw = expanded.shape
  seg_b = min(_SEG_B, cap8)
  assert cap8 % seg_b == 0, (cap8, seg_b)
  nb = cap8 // seg_b
  n8 = -(-n // 8) * 8
  pwf = pw + 128

  # payload rows: [grads | flat-hi | flat-lo | 0...]; the segment id is
  # split hi = flat // 2048, lo = flat % 2048 so both lanes stay exact
  # in f32 even for tables with >2^24 physical rows. Sentinel rows
  # (padding and the 2-tile overrun margin) carry flat == cap8,
  # matching no block.
  exp2 = jnp.concatenate(
      [expanded.astype(jnp.float32),
       (flat // 2048).astype(jnp.float32)[:, None],
       (flat % 2048).astype(jnp.float32)[:, None],
       jnp.zeros((n, 126), jnp.float32)], axis=1)
  sent = jnp.zeros((1, pwf), jnp.float32) \
      .at[0, pw].set(float(cap8 // 2048)) \
      .at[0, pw + 1].set(float(cap8 % 2048))
  exp2 = jnp.concatenate(
      [exp2, jnp.broadcast_to(sent, (n8 - n + 2 * _SEG_T, pwf))], axis=0)

  # ---- flat tile schedule (XLA): block input ranges -> (base, blk,
  # first) per tile; empty blocks get one sentinel tile so their zero
  # output block still gets pushed
  bounds = jnp.arange(nb + 1, dtype=jnp.int32) * seg_b
  starts = jnp.searchsorted(flat, bounds).astype(jnp.int32)
  s, e = starts[:-1], starts[1:]
  empty = e <= s
  base = jnp.where(empty, n8, (s // 8) * 8)
  ntl = jnp.where(empty, 1, -(-(e - base) // _SEG_T))
  pos = jnp.cumsum(ntl)                          # [nb] tile-range ends
  L = n8 // _SEG_T + 2 * nb + 2                  # static upper bound
  li = jnp.arange(L, dtype=jnp.int32)
  blk = jnp.minimum(jnp.searchsorted(pos, li, side='right'),
                    nb - 1).astype(jnp.int32)
  prev_end = jnp.where(blk > 0, jnp.take(pos, jnp.maximum(blk - 1, 0)), 0)
  within = li - prev_end
  valid = li < pos[nb - 1]
  t_base = jnp.where(valid, jnp.take(base, blk) + within * _SEG_T,
                     jnp.int32(n8))
  first = (valid & (within == 0)).astype(jnp.int32)
  live = (t_base < n8).astype(jnp.int32)   # sentinel tiles carry n8

  # pack the four [L] arrays into one SMEM page grid [4*R, 128]
  rows = -(-L // 128)
  r8 = -(-rows // 8) * 8
  sched = jnp.zeros((4, r8 * 128), jnp.int32)
  sched = sched.at[0, :L].set(t_base).at[1, :L].set(blk)
  sched = sched.at[2, :L].set(first).at[3, :L].set(live)
  sched = sched.reshape(4 * r8, 128)

  def kernel(sched_ref, exp_ref, out_ref, tbuf, obuf, sem_in, sem_out):
    def sv(a, l):
      return sched_ref[a * r8 + l // 128, l % 128]

    def in_copy(l, slot):
      return pltpu.make_async_copy(
          exp_ref.at[pl.ds(pl.multiple_of(sv(0, l), 8), _SEG_T)],
          tbuf.at[slot], sem_in.at[slot])

    def out_copy(b, slot):
      return pltpu.make_async_copy(
          obuf.at[slot],
          out_ref.at[pl.ds(pl.multiple_of(b * seg_b, seg_b), seg_b)],
          sem_out.at[slot])

    pl.when(sv(3, 0) == 1)(lambda: in_copy(0, 0).start())
    if L > 1:
      pl.when(sv(3, 1) == 1)(lambda: in_copy(1, 1).start())

    def body(l, carry):
      oslot, pushes = carry
      slot = jax.lax.rem(l, 2)
      blk_l = sv(1, l)
      first_l = sv(2, l)
      live_l = sv(3, l)
      pl.when(live_l == 1)(lambda: in_copy(l, slot).wait())

      # block transition: push the finished block, flip the out buffer
      def transition():
        out_copy(sv(1, l - 1), oslot).start()

      pl.when((first_l == 1) & (l > 0))(transition)
      oslot2 = jnp.where((first_l == 1) & (l > 0), 1 - oslot, oslot)
      pushes2 = pushes + ((first_l == 1) & (l > 0)).astype(jnp.int32)

      # the new out buffer may still be draining its push from two
      # blocks ago — wait before overwriting
      pl.when((first_l == 1) & (pushes2 >= 2))(
          lambda: out_copy(0, oslot2).wait())

      def compute():
        vals = tbuf[slot, :, :pw]
        flat_i = tbuf[slot, :, pw].astype(jnp.int32) * 2048 + \
            tbuf[slot, :, pw + 1].astype(jnp.int32)
        cols = flat_i - blk_l * seg_b
        # one-hot built in [T, B] orientation: flatv is a SUBLANE vector
        # (one value per input row) so cols[:, None] broadcasts along
        # lanes for free — the transposed [B, T] build needs a
        # sublane->lane vector relayout that measured pathologically
        # slow. The contraction below runs over axis 0 of both operands.
        iota = jax.lax.broadcasted_iota(jnp.int32, (_SEG_T, seg_b), 1)
        p1 = (cols[:, None] == iota).astype(jnp.bfloat16)
        hi = vals.astype(jnp.bfloat16)
        lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        if _SEG_STACK:
          # one K=2T pass: [hi|lo] stacked along the contraction axis
          p2 = jnp.concatenate([p1, p1], axis=0)
          v2 = jnp.concatenate([hi, lo], axis=0)
          acc = jax.lax.dot_general(p2, v2, dn,
                                    preferred_element_type=jnp.float32)
        else:
          acc = jax.lax.dot_general(p1, hi, dn,
                                    preferred_element_type=jnp.float32)
          acc = acc + jax.lax.dot_general(p1, lo, dn,
                                          preferred_element_type=jnp.float32)

        def set_block():
          obuf[oslot2] = acc

        def add_block():
          obuf[oslot2] = obuf[oslot2] + acc

        pl.when(first_l == 1)(set_block)
        pl.when(first_l == 0)(add_block)

      def zero_block():                     # empty block's only tile
        obuf[oslot2] = jnp.zeros((seg_b, pw), jnp.float32)

      pl.when(live_l == 1)(compute)
      pl.when((live_l == 0) & (first_l == 1))(zero_block)

      pl.when((l + 2 < L) &
              (sv(3, jnp.minimum(l + 2, L - 1)) == 1))(
          lambda: in_copy(l + 2, slot).start())
      return (oslot2, pushes2)

    oslot, pushes = jax.lax.fori_loop(0, L, body,
                                      (jnp.int32(0), jnp.int32(0)))
    # final block push + drain both slots
    out_copy(sv(1, L - 1), oslot).start()
    out_copy(0, oslot).wait()
    if nb >= 2:
      pl.when(pushes >= 1)(lambda: out_copy(0, 1 - oslot).wait())

  fn = pl.pallas_call(
      kernel,
      grid=(1,),
      in_specs=[
          pl.BlockSpec((4 * r8, 128), lambda i: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec(memory_space=pltpu.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
      out_shape=jax.ShapeDtypeStruct((cap8, pw), jnp.float32),
      scratch_shapes=[
          pltpu.VMEM((2, _SEG_T, pwf), jnp.float32),
          pltpu.VMEM((2, seg_b, pw), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )
  return fn(sched, exp2)


# ----------------------------------------------------------- update prep

def _expand_lanes(sgrads: jnp.ndarray, lane: jnp.ndarray,
                  meta: PackMeta):
  """[N, dim] grads + per-row lane -> [N, part_width] compact rows:
  tiled[:, q] = sgrads[:, q % dim] masked to q // dim == lane."""
  n = sgrads.shape[0]
  pw = meta.part_width
  live = meta.pack * meta.dim
  tiled = jnp.tile(sgrads.astype(jnp.float32), (1, live // meta.dim))
  q = jnp.arange(live, dtype=jnp.int32)
  sel = (q // meta.dim)[None, :] == lane[:, None]
  expanded = jnp.where(sel, tiled, 0.0)
  if pw != live:
    expanded = jnp.concatenate(
        [expanded, jnp.zeros((n, pw - live), jnp.float32)], axis=1)
  return expanded


def _prep_sorted(ids: jnp.ndarray, grads: jnp.ndarray, meta: PackMeta):
  """Shared head of the update prep: sort + group dedup + compact lane
  expansion. Returns (ugids [cap], expanded [N, part_width], flat [N],
  cap) with `flat` SORTED (dense group segment * 8 + sublane)."""
  n = ids.shape[0]
  # UNSTABLE two-operand sort instead of argsort: measured 1.79 vs
  # 2.52 ms for argsort+takes at flagship shapes (PERF.md r4) —
  # argsort is a STABLE sort and pays for the stability passes; update
  # order among equal ids is irrelevant (duplicates segment-sum).
  # (An i64 (id<<bits|idx) single-array sort measured 1.71 ms but jax
  # silently downcasts i64 under the default x64-disabled mode and the
  # packed key overflows for tables beyond 2^(31-log2 N) rows.)
  iota = jnp.arange(n, dtype=jnp.int32)
  sids, order = jax.lax.sort((ids, iota), is_stable=False, num_keys=1)
  sgrads = jnp.take(grads, order, axis=0).astype(jnp.float32)
  gids = sids // meta.group_rows
  within = sids % meta.group_rows
  sub = within // meta.pack
  lane = within % meta.pack
  first = jnp.concatenate([jnp.ones((1,), bool), gids[1:] != gids[:-1]])
  gseg = jnp.cumsum(first) - 1                 # group-level segment ids
  # cap rounds up to _SEG_B/8 so cap*8 is a whole number of _SEG_B-row
  # output blocks for the Mosaic segmented-sum (meta.groups is a
  # multiple of 256, so the min stays block-aligned)
  _SEG_B = _seg_b()
  q = _SEG_B // 8
  cap = min(-(-n // q) * q, meta.groups)
  # padding slots get an OUT-OF-BOUNDS sentinel (== meta.groups): the
  # kernel predicates their DMAs off and the XLA fallback drops their
  # scatter writes. A real scratch-gid entry would otherwise DUPLICATE
  # a live group in sharded mode (local_view's scratch is a real group
  # on every shard but the last) and race its update.
  ugids = jnp.full((cap,), meta.groups,
                   gids.dtype).at[gseg].set(gids, mode='drop')
  # compact lane expansion: tiled[:, q] = sgrads[:, q % dim], masked to
  # this row's lane block q // dim == lane; zero-pad up to part_width.
  # (A narrower segment-sum over the raw [N, dim] grads with
  # slot-granular segment ids is algebraically identical and 8x less
  # input — but measured 2x SLOWER in-step: the [*, dim] minor axis
  # tile-pads to 128 lanes on TPU, so the un-expanded form inflates the
  # scatter 8x. The 128-lane expanded form below is load-bearing.)
  expanded = _expand_lanes(sgrads, lane, meta)
  # sids sorted => (gseg, sub) sorted => flat sorted; duplicates and
  # same-physical-row collisions sum in one pass.
  flat = gseg * 8 + sub
  return ugids, expanded, flat, cap


def group_prep(ids: jnp.ndarray, grads: jnp.ndarray, meta: PackMeta,
               use_pallas: bool = False, interpret: bool = False):
  """Raw (duplicated) ids + grads [N, dim] -> (ugids [cap], gg
  [cap, 8, part_width]) — fused sort + group dedup + lane expansion +
  ONE sorted segment-sum (replaces dedup_sum + per-row scatters of the
  plain path). With use_pallas the segment-sum runs as the Mosaic
  segmented-sum kernel (_seg_sum_pallas) instead of an XLA scatter.

  gg is COMPACT: gg[k, s, lane*dim + d] is the summed gradient for the
  logical row at (group k, sublane s, lane); the kernel expands it to
  combined part-0 positions with one static matmul. Padding slots target
  the scratch group with zero gradients. cap = min(N, groups) truncates
  small tables (the wide [26M, 1] table has only ~25k groups for ~106k
  id slots).

  The segment-sum IS ~90% of group_prep (8.1 of 8.8 ms at bench
  shapes: an XLA scatter-add at the ~108 ns/row wall). The Mosaic
  segmented-sum kernel (_seg_sum_pallas: dense-sequential output blocks
  + one-hot matmul accumulation) is an opt-in alternative
  (EASYREC_SEG_SUM_KERNEL=1); correctness is pinned by
  tests/test_packed_table.py::test_seg_sum_kernel_parity. The fused RMW
  kernel (_rmw_fused_pallas) skips this materialization entirely.

  SORT-FREE path: when cap would reach meta.groups anyway (sequence-
  heavy steps on small tables — Taobao DIN pushes 471k ids at a 19.4k-
  group table), the argsort/dedup buys nothing: every group may be
  touched, so key the segment-sum by the physical row directly and
  return ugids = arange(groups). Measured 11.4 vs 16.9 ms at the DIN
  shape (benchmarks/bench_prep_variants.py); per-row lazy semantics are
  preserved because the RMW kernel masks zero-grad rows
  (_math_and_mask `touched`). EASYREC_NOSORT_PREP=0 restores the
  sorted path everywhere."""
  n = ids.shape[0]
  _SEG_B0 = _seg_b()
  q0 = _SEG_B0 // 8
  want_cap = min(-(-n // q0) * q0, meta.groups)
  if want_cap >= meta.groups and \
      _os.environ.get('EASYREC_NOSORT_PREP', '1') == '1':
    within = ids % meta.group_rows
    lane = within % meta.pack
    expanded = _gg_cast(_expand_lanes(grads, lane, meta))
    flat = (ids // meta.group_rows) * 8 + within // meta.pack
    gg = jax.ops.segment_sum(expanded, flat,
                             num_segments=meta.groups * 8)
    return jnp.arange(meta.groups, dtype=ids.dtype), \
        gg.reshape(meta.groups, 8, meta.part_width)
  ugids, expanded, flat, cap = _prep_sorted(ids, grads, meta)
  pw = meta.part_width
  _SEG_B = _seg_b()
  seg_kernel = (use_pallas and
                _os.environ.get('EASYREC_SEG_SUM_KERNEL') == '1')
  # the kernel needs a whole number of seg_b-row output blocks; a
  # truncated cap (== local groups of a sharded small table) may not
  # divide — fall back to the XLA scatter there
  div_ok = cap * 8 % min(_SEG_B, cap * 8) == 0
  if not div_ok:
    seg_kernel = False
  if seg_kernel or (interpret and div_ok):
    # the Mosaic segmented-sum kernel is f32-only
    gg = _seg_sum_pallas(expanded, flat, cap * 8, interpret=interpret)
  else:
    gg = jax.ops.segment_sum(_gg_cast(expanded), flat,
                             num_segments=cap * 8,
                             indices_are_sorted=True)
  return ugids, gg.reshape(cap, 8, pw)


# ---------------------------------------------------- static matrices

@functools.lru_cache(maxsize=None)
def _touch_matrix(width: int, cc: int):
  """kron(I_pack, ones(cc, cc)): row-level touched mask from per-element
  nonzeros without narrow reshapes."""
  pack = width // cc
  return np.kron(np.eye(pack, dtype=np.float32),
                 np.ones((cc, cc), np.float32))


@functools.lru_cache(maxsize=None)
def _extract_matrix(width: int, cc: int, dim: int, part: int,
                    part_width: int):
  """W x part_width 0/1: combined row -> compact part-p view
  (lane l, element d) at compact col l*dim + d."""
  pack = width // cc
  e = np.zeros((width, part_width), np.float32)
  for lane in range(pack):
    for d in range(dim):
      e[lane * cc + part * dim + d, lane * dim + d] = 1.0
  return e


# --------------------------------------------------------------- kernel

def _math_and_mask(old_blk, gc_blk, hyp, math_fn, meta: PackMeta,
                   touch_m, e0t, roll):
  """Shared by the Mosaic kernel and the XLA fallback: combined blocks
  [rows, W] + compact grads [rows, part_width] -> updated combined
  blocks. Untouched rows keep their bytes.

  The slot parts of a logical row sit exactly p*dim lanes right of its
  weights, so roll(old, -p*dim) aligns every part to the part-0 columns
  and the optimizer's block_math runs on full-width vectors unchanged —
  no per-part extract/reassemble matmuls (HIGHEST-precision f32 matmuls
  measured ~30 ms/step at bench shapes). The only matmuls left: the
  compact->part-0 gradient expansion (HIGHEST, one small 0/1 matrix)
  and the touched-row mask (bf16 — exact for 0/1 sums up to cc)."""
  hi = jax.lax.Precision.HIGHEST
  col = jax.lax.broadcasted_iota(jnp.int32, old_blk.shape, 1)
  if meta.n_parts == 1 and meta.part_width == meta.width:
    gfull = gc_blk
  elif meta.pack <= 8:
    # compact -> part-0 expansion as `pack` static rolls + masks: pure
    # lane movement, EXACT, and off the MXU (the HIGHEST-precision
    # selector matmul here measured ~6 ms/step at bench shapes)
    pad_w = meta.width - meta.part_width
    gcp = gc_blk if not pad_w else jnp.concatenate(
        [gc_blk, jnp.zeros((gc_blk.shape[0], pad_w), gc_blk.dtype)],
        axis=1)
    gfull = jnp.zeros_like(gcp)
    for lane in range(meta.pack):
      m = ((col // meta.cc) == lane) & ((col % meta.cc) < meta.dim)
      gfull = jnp.where(m, roll(gcp, lane * (meta.cc - meta.dim)),
                        gfull)
  else:
    # few-group tables (e.g. the wide [26M, 1]: pack=128): one selector
    # matmul; HIGHEST keeps the f32 mantissa
    gfull = jax.lax.dot(gc_blk, e0t, precision=hi)       # [rows, W]
  nz = (gfull != 0.0).astype(jnp.bfloat16)
  # bf16 inputs + f32 accumulator = the native full-speed MXU mode
  touched = jax.lax.dot(nz, touch_m,
                        preferred_element_type=jnp.float32) > 0.5
  olds = [old_blk] + [roll(old_blk, -p * meta.dim)
                      for p in range(1, meta.n_parts)]
  news = math_fn(olds, gfull, hyp)
  part = (col % meta.cc) // meta.dim
  new = old_blk
  for p in range(meta.n_parts):
    cand = news[p] if p == 0 else roll(news[p], p * meta.dim)
    new = jnp.where((part == p) & touched, cand, new)
  return new


def _rmw_pallas(table: jnp.ndarray,
                ugids: jnp.ndarray,
                gg: jnp.ndarray,
                hypers: jnp.ndarray,
                math_fn: Callable,
                meta: PackMeta,
                interpret: bool = False,
                predicate: bool = False):
  """Per grid chunk: pull touched groups (one DMA each), run the
  optimizer math on compact part views, push back. The table is
  input/output-aliased — donate the caller's buffer for in-place RMW.

  With EASYREC_PACKED_PIPELINE=1 (the default; measured 19.3 vs 20.2 ms
  on the flagship deep table, v5e, bit-exact) the group buffer is
  double-slotted and
  chunk i+1's pulls are issued BEFORE chunk i's math, hiding the pull
  issue loop + DMA latency under the optimizer math. Cross-chunk writes
  never alias a concurrent read: live groups are globally unique after
  dedup; sentinel entries either skip their DMAs (predicated/sharded
  mode) or clamp to the sacrificial scratch group whose push always
  carries byte-identical data (zero gradient => untouched rows)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  pipeline = _os.environ.get('EASYREC_PACKED_PIPELINE', '1') == '1'
  _UNROLL, _CHUNK_MB = _unroll(), _chunk_mb()
  n = ugids.shape[0]
  w = meta.width
  # VMEM: buf (x2 slots when pipelined) + double-buffered gg block, plus
  # ~12 sub-tile-sized math temporaries (the math runs over SUB-group
  # slices of the buffer so big DMA chunks don't blow the 16 MB
  # scoped-vmem stack)
  per_chunk = 8 * w * 4
  slots = 2 if pipeline else 1
  chunk = max(_LANE, min(_PAGE, (_CHUNK_MB << 20)
                         // ((2 + slots) * per_chunk) // _LANE * _LANE))
  sub = min(chunk, max(32, (4 << 20) // (12 * per_chunk) // 32 * 32))
  while chunk % sub:
    sub -= 32
  pw = meta.part_width
  pad = (-n) % chunk
  if pad:
    ugids = jnp.concatenate(
        [ugids, jnp.full((pad,), meta.groups, ugids.dtype)])
    gg = jnp.concatenate([gg, jnp.zeros((pad, 8, pw), gg.dtype)])
  n_pad = ugids.shape[0]
  # ids in SMEM as one fixed (8, 64)-slot page per grid step (SMEM
  # blocks need 8/128-divisible trailing dims); first `chunk` slots
  # used. Sentinel entries (gid == groups: dedup padding) carry flag 0
  # — the kernel skips their DMAs entirely, so they can never duplicate
  # (and race) a live group's write-back.
  nc = n_pad // chunk
  live = (ugids < meta.groups).astype(jnp.int32)
  gids_c = jnp.minimum(ugids.astype(jnp.int32), meta.groups - 1)
  gid_page = jnp.zeros((nc, _PAGE), jnp.int32)
  gid_page = gid_page.at[:, :chunk].set(gids_c.reshape(nc, chunk))
  gid3 = gid_page.reshape(nc, 8, _LANE)
  flag_page = jnp.zeros((nc, _PAGE), jnp.int32)
  flag_page = flag_page.at[:, :chunk].set(live.reshape(nc, chunk))
  flag3 = flag_page.reshape(nc, 8, _LANE)
  # per-chunk liveness page: [i, 0, 0] = chunk i has any live entry,
  # [i, 0, 1] = chunk i+1 has any live entry. Dedup puts sentinels at
  # the TAIL of ugids, so dead chunks form a suffix — the pipelined
  # kernel skips their DMA loops and math entirely with one scalar
  # branch. The static cap (= min(N, groups)) sizes the worst case;
  # realistic zipf-distributed ids touch far fewer unique groups and
  # the skipped tail makes the kernel cost track the ACTUAL unique
  # count instead of the cap.
  chunk_live = (jnp.sum(live.reshape(nc, chunk), axis=1) > 0) \
      .astype(jnp.int32)
  alive_page = jnp.zeros((nc, _PAGE), jnp.int32)
  alive_page = alive_page.at[:, 0].set(chunk_live)
  alive_page = alive_page.at[:-1, 1].set(chunk_live[1:])
  alive3 = alive_page.reshape(nc, 8, _LANE)
  table3 = table.reshape(meta.groups, 8, w)
  touch_m = jnp.asarray(_touch_matrix(w, meta.cc)).astype(jnp.bfloat16)
  e0t = jnp.asarray(
      _extract_matrix(w, meta.cc, meta.dim, 0, pw)).T  # [pw, W]

  def gid_at(ref, i):
    return ref[0, i // _LANE, i % _LANE]

  def guarded_at(fref, i, body):
    if predicate:
      pl.when(fref[0, i // _LANE, i % _LANE] != 0)(body)
    else:
      body()

  def kernel(*refs):
    (gid_ref, flag_ref, gg_ref, hyp_ref, tm_ref, e0t_ref, _in_tbl,
     out_ref, buf, sem_in, sem_out) = refs
    hyp = lambda k: hyp_ref[0, k]   # noqa: E731

    def gid(i):
      return gid_ref[0, i // _LANE, i % _LANE]

    def guarded(i, body):
      # predicated mode (sharded tables): sentinel/padding entries skip
      # their DMAs so they can never duplicate a LIVE group's write-back
      # (the local scratch group holds real rows on most shards).
      # Unpredicated mode (single device): sentinels clamp to the global
      # sacrificial scratch group, duplicate writes carry identical
      # bytes, and skipping the per-copy branch is ~12% of the step.
      if predicate:
        pl.when(flag_ref[0, i // _LANE, i % _LANE] != 0)(body)
      else:
        body()

    def pull(j, _):
      for u in range(_UNROLL):
        i = j * _UNROLL + u
        guarded(i, lambda i=i: pltpu.make_async_copy(
            out_ref.at[gid(i)], buf.at[i], sem_in).start())
      return 0

    def pull_wait(j, _):
      for u in range(_UNROLL):
        i = j * _UNROLL + u
        guarded(i, lambda i=i: pltpu.make_async_copy(
            out_ref.at[gid(i)], buf.at[i], sem_in).wait())
      return 0

    jax.lax.fori_loop(0, chunk // _UNROLL, pull, 0)
    jax.lax.fori_loop(0, chunk // _UNROLL, pull_wait, 0)

    tm = tm_ref[:]
    e0t_m = e0t_ref[:]

    def kroll(x, s):
      # pltpu.roll wants non-negative shifts; rolls are cyclic so
      # shifting by s % w is equivalent
      return pltpu.roll(x, shift=s % w, axis=1)

    # sequential fori_loop (not an unrolled python loop): each sub-tile's
    # block temporaries must REUSE the scoped-vmem stack, or big chunks
    # exceed the 16 MB limit
    def math_tile(s, _):
      sl = pl.ds(s * sub, sub)
      old = buf[sl].reshape(sub * 8, w).astype(jnp.float32)
      gc = gg_ref[sl].reshape(sub * 8, pw).astype(jnp.float32)
      new = _math_and_mask(old, gc, hyp, math_fn, meta, tm, e0t_m,
                           kroll)
      buf[sl] = new.reshape(sub, 8, w).astype(buf.dtype)
      return 0

    jax.lax.fori_loop(0, chunk // sub, math_tile, 0)

    def push(j, _):
      for u in range(_UNROLL):
        i = j * _UNROLL + u
        guarded(i, lambda i=i: pltpu.make_async_copy(
            buf.at[i], out_ref.at[gid(i)], sem_out).start())
      return 0

    def push_wait(j, _):
      for u in range(_UNROLL):
        i = j * _UNROLL + u
        guarded(i, lambda i=i: pltpu.make_async_copy(
            buf.at[i], out_ref.at[gid(i)], sem_out).wait())
      return 0

    jax.lax.fori_loop(0, chunk // _UNROLL, push, 0)
    jax.lax.fori_loop(0, chunk // _UNROLL, push_wait, 0)

  def kernel_pipe(*refs):
    # Software-pipelined: chunk i+1's pulls are in flight during chunk
    # i's math. Phase order per grid step i (slot cur = i%2):
    #   1. drain chunk i-1's pushes (slot nxt is about to be re-pulled)
    #   2. (i==0 only) issue chunk 0's own pulls
    #   3. issue chunk i+1's pulls into slot nxt
    #   4. wait chunk i's pulls; optimizer math on slot cur; push cur
    #   5. (last live chunk only) drain own pushes
    # Waits are count-based on the per-slot DMA semaphore, so the wait
    # descriptors may be rebuilt with CURRENT gids; in predicated mode
    # the issued-copy COUNT for chunk i-1 comes from its own flag page
    # (flag_pref).
    #
    # Two r5 issue-count levers (the kernel is DMA-ISSUE-bound at
    # ~48 ns per .start(); waits on a drained semaphore are ~free —
    # benchmarks/bench_dma_issue.py variants F/G):
    #   - chunk skip: dead chunks (all-sentinel, a tail suffix by
    #     construction) run NO DMAs and no math — one scalar branch.
    #     With zipf-distributed real ids the unique-group count
    #     collapses far below the static cap and the skipped tail makes
    #     kernel cost track the actual touched set.
    #   - bulk waits (unpredicated mode): ONE .wait() on an unstarted
    #     whole-slot descriptor replaces the per-copy wait loop; its
    #     byte count equals the sum of the chunk's equal-sized copies
    #     on the shared per-slot semaphore. (pltpu.semaphore_wait
    #     rejects DMA semaphores; the descriptor form is the supported
    #     spelling of the same bulk wait.) Predicated mode keeps
    #     per-copy waits: skipped copies never increment the semaphore.
    (gid_ref, gid_nref, flag_ref, flag_nref, flag_pref, alive_ref,
     gg_ref, hyp_ref, tm_ref, e0t_ref, _in_tbl, out_ref, buf, sem_in,
     sem_out) = refs
    hyp = lambda k: hyp_ref[0, k]   # noqa: E731
    i = pl.program_id(0)
    cur = jax.lax.rem(i, 2)
    nxt = 1 - cur
    alive = alive_ref[0, 0, 0]
    alive_nxt = alive_ref[0, 0, 1]

    def dma_loop(gref, fref, slot, is_pull, sem, action):
      if action == 'wait' and not predicate and not interpret:
        # bulk drain: equal-sized copies on one semaphore — a single
        # slot-sized descriptor wait replaces chunk scalar-loop waits
        # (the interpreter's semaphore model counts copies, not bytes —
        # keep per-copy waits there)
        pltpu.make_async_copy(buf.at[slot], buf.at[slot],
                              sem.at[slot]).wait()
        return

      def lp(j, _):
        for u in range(_UNROLL):
          k = j * _UNROLL + u

          def b(k=k):
            g = gid_at(gref, k)
            if is_pull:
              c = pltpu.make_async_copy(out_ref.at[g], buf.at[slot, k],
                                        sem.at[slot])
            else:
              c = pltpu.make_async_copy(buf.at[slot, k], out_ref.at[g],
                                        sem.at[slot])
            getattr(c, action)()
          guarded_at(fref, k, b)
        return 0
      jax.lax.fori_loop(0, chunk // _UNROLL, lp, 0)

    # alive(i) implies alive(i-1): sentinels are a dedup tail suffix,
    # so live chunks form a prefix and every wait below is matched by
    # copies a LIVE chunk actually started.
    pl.when((i > 0) & (alive == 1))(
        lambda: dma_loop(gid_ref, flag_pref, nxt, False, sem_out,
                         'wait'))
    pl.when((i == 0) & (alive == 1))(
        lambda: dma_loop(gid_ref, flag_ref, cur, True, sem_in, 'start'))
    pl.when((i + 1 < nc) & (alive_nxt == 1))(
        lambda: dma_loop(gid_nref, flag_nref, nxt, True, sem_in,
                         'start'))
    pl.when(alive == 1)(
        lambda: dma_loop(gid_ref, flag_ref, cur, True, sem_in, 'wait'))

    tm = tm_ref[:]
    e0t_m = e0t_ref[:]

    def kroll(x, s):
      return pltpu.roll(x, shift=s % w, axis=1)

    def math_tile(s, _):
      sl = pl.ds(s * sub, sub)
      old = buf[cur, sl].reshape(sub * 8, w).astype(jnp.float32)
      gc = gg_ref[sl].reshape(sub * 8, pw).astype(jnp.float32)
      new = _math_and_mask(old, gc, hyp, math_fn, meta, tm, e0t_m,
                           kroll)
      buf[cur, sl] = new.reshape(sub, 8, w).astype(buf.dtype)
      return 0

    def run_math():
      jax.lax.fori_loop(0, chunk // sub, math_tile, 0)

    pl.when(alive == 1)(run_math)

    pl.when(alive == 1)(
        lambda: dma_loop(gid_ref, flag_ref, cur, False, sem_out,
                         'start'))
    # drain own pushes on the LAST LIVE chunk (later chunks skip)
    pl.when((alive == 1) & ((i == nc - 1) | (alive_nxt == 0)))(
        lambda: dma_loop(gid_ref, flag_ref, cur, False, sem_out,
                         'wait'))

  id_spec = lambda ix: pl.BlockSpec((1, 8, _LANE), ix,          # noqa
                                    memory_space=pltpu.SMEM)
  cur_ix = lambda i: (i, 0, 0)                                  # noqa
  nxt_ix = lambda i: (jnp.minimum(i + 1, nc - 1), 0, 0)         # noqa
  prv_ix = lambda i: (jnp.maximum(i - 1, 0), 0, 0)              # noqa
  shared_specs = [
      pl.BlockSpec((chunk, 8, pw), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((8, _LANE), lambda i: (0, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((pw, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec(memory_space=pl.ANY)]
  hyp_page = jnp.zeros((8, _LANE), jnp.float32)
  hyp_page = hyp_page.at[0, :hypers.shape[0]].set(
      hypers.astype(jnp.float32))
  if pipeline:
    fn = pl.pallas_call(
        kernel_pipe,
        grid=(nc,),
        in_specs=([id_spec(cur_ix), id_spec(nxt_ix), id_spec(cur_ix),
                   id_spec(nxt_ix), id_spec(prv_ix), id_spec(cur_ix)]
                  + shared_specs),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
        scratch_shapes=[pltpu.VMEM((2, chunk, 8, w), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )
    out = fn(gid3, gid3, flag3, flag3, flag3, alive3, gg, hyp_page,
             touch_m, e0t, table3)
    return out.reshape(meta.phys_rows, w)
  fn = pl.pallas_call(
      kernel,
      grid=(nc,),
      in_specs=([id_spec(cur_ix), id_spec(cur_ix)] + shared_specs),
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
      scratch_shapes=[pltpu.VMEM((chunk, 8, w), jnp.float32),
                      pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
      input_output_aliases={6: 0},
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
      interpret=interpret,
  )
  out = fn(gid3, flag3, gg, hyp_page, touch_m, e0t, table3)
  return out.reshape(meta.phys_rows, w)


def _rmw_fused_pallas(table: jnp.ndarray,
                      ugids: jnp.ndarray,
                      expanded: jnp.ndarray,
                      flat: jnp.ndarray,
                      hypers: jnp.ndarray,
                      math_fn: Callable,
                      meta: PackMeta,
                      interpret: bool = False,
                      predicate: bool = False):
  """Pipelined RMW with the segmented gradient sum FUSED into the
  kernel: gg never materializes in HBM (the separate segment-sum wrote
  + re-read ~2x cap*8*part_width*4 bytes — 870 MB/step at bench shapes).

  Per grid step i (chunk of `chunk` groups = cb flat gg rows), on top of
  the _rmw_pallas pipelined phase order:
    - after issuing chunk i+1's pulls, the kernel streams chunk i's
      SORTED expanded-gradient rows (tile ranges precomputed with one
      searchsorted) and accumulates them into a [cb, part_width] VMEM
      acc with one-hot matmuls (bf16 hi+lo split, f32 acc — the
      _seg_sum_pallas scheme), overlapping the group-pull DMAs;
    - the optimizer math then reads compact grads from acc instead of a
      streamed gg block.
  Rows pulled in by tile ALIGNMENT or OVERRUN belong to neighbour
  chunks: their cols fall outside [0, cb) so the one-hot contributes
  zero. Sentinel padding rows carry flat == n_pad_groups*8 >= any
  chunk's upper bound."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  _UNROLL, _CHUNK_MB = _unroll(), _chunk_mb()
  T = _seg_t()
  w = meta.width
  pw = meta.part_width
  per_chunk = 8 * w * 4
  chunk = max(_LANE, min(_PAGE, (_CHUNK_MB << 20)
                         // (4 * per_chunk) // _LANE * _LANE))
  sub = min(chunk, max(32, (4 << 20) // (12 * per_chunk) // 32 * 32))
  while chunk % sub:
    sub -= 32
  cb = chunk * 8
  cap = ugids.shape[0]
  pad = (-cap) % chunk
  if pad:
    ugids = jnp.concatenate(
        [ugids, jnp.full((pad,), meta.groups, ugids.dtype)])
  npg = ugids.shape[0]
  nc = npg // chunk
  live = (ugids < meta.groups).astype(jnp.int32)
  gids_c = jnp.minimum(ugids.astype(jnp.int32), meta.groups - 1)
  gid3 = jnp.zeros((nc, _PAGE), jnp.int32).at[:, :chunk].set(
      gids_c.reshape(nc, chunk)).reshape(nc, 8, _LANE)
  flag3 = jnp.zeros((nc, _PAGE), jnp.int32).at[:, :chunk].set(
      live.reshape(nc, chunk)).reshape(nc, 8, _LANE)

  # ---- expanded-gradient stream: payload rows [grads | flat-hi |
  # flat-lo | 0...] (hi/lo = flat // 2048, flat % 2048 keep the segment
  # id f32-exact beyond 2^24 rows); sentinel margin carries
  # flat == npg*8, matching no chunk's [0, cb) window
  n = expanded.shape[0]
  n8 = -(-n // 8) * 8
  pwf = pw + 128
  flat = flat.astype(jnp.int32)
  exp2 = jnp.concatenate(
      [expanded.astype(jnp.float32),
       (flat // 2048).astype(jnp.float32)[:, None],
       (flat % 2048).astype(jnp.float32)[:, None],
       jnp.zeros((n, 126), jnp.float32)], axis=1)
  sent = jnp.zeros((1, pwf), jnp.float32) \
      .at[0, pw].set(float((npg * 8) // 2048)) \
      .at[0, pw + 1].set(float((npg * 8) % 2048))
  exp2 = jnp.concatenate(
      [exp2, jnp.broadcast_to(sent, (n8 - n + 2 * T, pwf))], axis=0)

  # ---- per-chunk tile schedule: one searchsorted over the sorted flat
  bounds = jnp.arange(nc + 1, dtype=jnp.int32) * cb
  starts = jnp.searchsorted(flat, bounds).astype(jnp.int32)
  s_, e_ = starts[:-1], starts[1:]
  empty = e_ <= s_
  base = jnp.where(empty, jnp.int32(n8), (s_ // 8) * 8)
  ntl = jnp.where(empty, 0, -(-(e_ - base) // T))
  sched3 = jnp.zeros((nc, _PAGE), jnp.int32).at[:, 0].set(base) \
      .at[:, 1].set(ntl).reshape(nc, 8, _LANE)

  table3 = table.reshape(meta.groups, 8, w)
  touch_m = jnp.asarray(_touch_matrix(w, meta.cc)).astype(jnp.bfloat16)
  e0t = jnp.asarray(
      _extract_matrix(w, meta.cc, meta.dim, 0, pw)).T  # [pw, W]

  def gid_at(ref, k):
    return ref[0, k // _LANE, k % _LANE]

  def guarded_at(fref, k, body):
    if predicate:
      pl.when(fref[0, k // _LANE, k % _LANE] != 0)(body)
    else:
      body()

  def kernel(*refs):
    (gid_ref, gid_nref, flag_ref, flag_nref, flag_pref, sched_ref,
     hyp_ref, tm_ref, e0t_ref, exp_ref, _in_tbl, out_ref, buf, acc,
     tbuf, sem_in, sem_out, sem_t) = refs
    hyp = lambda k: hyp_ref[0, k]   # noqa: E731
    i = pl.program_id(0)
    cur = jax.lax.rem(i, 2)
    nxt = 1 - cur

    def dma_loop(gref, fref, slot, is_pull, sem, action):
      def lp(j, _):
        for u in range(_UNROLL):
          k = j * _UNROLL + u

          def b(k=k):
            g = gid_at(gref, k)
            if is_pull:
              c = pltpu.make_async_copy(out_ref.at[g], buf.at[slot, k],
                                        sem.at[slot])
            else:
              c = pltpu.make_async_copy(buf.at[slot, k], out_ref.at[g],
                                        sem.at[slot])
            getattr(c, action)()
          guarded_at(fref, k, b)
        return 0
      jax.lax.fori_loop(0, chunk // _UNROLL, lp, 0)

    pl.when(i > 0)(lambda: dma_loop(gid_ref, flag_pref, nxt, False,
                                    sem_out, 'wait'))
    pl.when(i == 0)(lambda: dma_loop(gid_ref, flag_ref, cur, True,
                                     sem_in, 'start'))
    pl.when(i + 1 < nc)(lambda: dma_loop(gid_nref, flag_nref, nxt, True,
                                         sem_in, 'start'))

    # ---- in-kernel segmented sum for chunk i (pull DMAs in flight)
    tbase = sched_ref[0, 0, 0]
    ntl_i = sched_ref[0, 0, 1]
    acc[...] = jnp.zeros((cb, pw), jnp.float32)

    def tile_copy(j, slot):
      return pltpu.make_async_copy(
          exp_ref.at[pl.ds(pl.multiple_of(tbase + j * T, 8), T)],
          tbuf.at[slot], sem_t.at[slot])

    pl.when(ntl_i > 0)(lambda: tile_copy(0, 0).start())
    pl.when(ntl_i > 1)(lambda: tile_copy(1, 1).start())

    def gg_body(j, _):
      slot = jax.lax.rem(j, 2)
      tile_copy(j, slot).wait()
      vals = tbuf[slot, :, :pw]
      flat_i = tbuf[slot, :, pw].astype(jnp.int32) * 2048 + \
          tbuf[slot, :, pw + 1].astype(jnp.int32)
      cols = flat_i - i * cb
      iota = jax.lax.broadcasted_iota(jnp.int32, (T, cb), 1)
      p1 = (cols[:, None] == iota).astype(jnp.bfloat16)
      hi = vals.astype(jnp.bfloat16)
      lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
      dn = (((0,), (0,)), ((), ()))
      a = jax.lax.dot_general(p1, hi, dn,
                              preferred_element_type=jnp.float32)
      a = a + jax.lax.dot_general(p1, lo, dn,
                                  preferred_element_type=jnp.float32)
      acc[...] = acc[...] + a
      pl.when(j + 2 < ntl_i)(lambda: tile_copy(j + 2, slot).start())
      return 0

    jax.lax.fori_loop(0, ntl_i, gg_body, 0)

    dma_loop(gid_ref, flag_ref, cur, True, sem_in, 'wait')

    tm = tm_ref[:]
    e0t_m = e0t_ref[:]

    def kroll(x, s):
      return pltpu.roll(x, shift=s % w, axis=1)

    def math_tile(s, _):
      sl = pl.ds(s * sub, sub)
      old = buf[cur, sl].reshape(sub * 8, w).astype(jnp.float32)
      gc = acc[pl.ds(s * sub * 8, sub * 8)]
      new = _math_and_mask(old, gc, hyp, math_fn, meta, tm, e0t_m,
                           kroll)
      buf[cur, sl] = new.reshape(sub, 8, w).astype(buf.dtype)
      return 0

    jax.lax.fori_loop(0, chunk // sub, math_tile, 0)

    dma_loop(gid_ref, flag_ref, cur, False, sem_out, 'start')
    pl.when(i == nc - 1)(lambda: dma_loop(gid_ref, flag_ref, cur, False,
                                          sem_out, 'wait'))

  id_spec = lambda ix: pl.BlockSpec((1, 8, _LANE), ix,          # noqa
                                    memory_space=pltpu.SMEM)
  cur_ix = lambda i: (i, 0, 0)                                  # noqa
  nxt_ix = lambda i: (jnp.minimum(i + 1, nc - 1), 0, 0)         # noqa
  prv_ix = lambda i: (jnp.maximum(i - 1, 0), 0, 0)              # noqa
  fn = pl.pallas_call(
      kernel,
      grid=(nc,),
      in_specs=[
          id_spec(cur_ix), id_spec(nxt_ix), id_spec(cur_ix),
          id_spec(nxt_ix), id_spec(prv_ix), id_spec(cur_ix),
          pl.BlockSpec((8, _LANE), lambda i: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((w, w), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((pw, w), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
      scratch_shapes=[pltpu.VMEM((2, chunk, 8, w), jnp.float32),
                      pltpu.VMEM((cb, pw), jnp.float32),
                      pltpu.VMEM((2, T, pwf), jnp.float32),
                      pltpu.SemaphoreType.DMA((2,)),
                      pltpu.SemaphoreType.DMA((2,)),
                      pltpu.SemaphoreType.DMA((2,))],
      input_output_aliases={10: 0},
      compiler_params=pltpu.CompilerParams(
          has_side_effects=True, dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )
  hyp_page = jnp.zeros((8, _LANE), jnp.float32)
  hyp_page = hyp_page.at[0, :hypers.shape[0]].set(
      hypers.astype(jnp.float32))
  out = fn(gid3, gid3, flag3, flag3, flag3, sched3, hyp_page, touch_m,
           e0t, exp2, table3)
  return out.reshape(meta.phys_rows, w)


def _dense_prep(ids: jnp.ndarray, grads: jnp.ndarray, meta: PackMeta):
  """Sort + lane expansion + ONE sorted segment-sum straight into the
  DENSE [groups*8, part_width] grad layout — no group dedup, no ugids.
  For tables whose touched-group count ~= ALL groups (the wide [26M, 1]
  table: ~106k id slots over 25.6k groups), the grouped path's dedup +
  per-group DMAs are pure overhead: the update is effectively a full
  table sweep either way."""
  order = jnp.argsort(ids)
  sids = jnp.take(ids, order)
  sgrads = jnp.take(grads, order, axis=0).astype(jnp.float32)
  gids = sids // meta.group_rows
  within = sids % meta.group_rows
  sub = within // meta.pack
  lane = within % meta.pack
  pw = meta.part_width
  live = meta.pack * meta.dim
  n = ids.shape[0]
  tiled = jnp.tile(sgrads, (1, live // meta.dim))
  q = jnp.arange(live, dtype=jnp.int32)
  sel = (q // meta.dim)[None, :] == lane[:, None]
  expanded = jnp.where(sel, tiled, 0.0)
  if pw != live:
    expanded = jnp.concatenate(
        [expanded, jnp.zeros((n, pw - live), jnp.float32)], axis=1)
  flat = gids * 8 + sub                         # sorted (sids sorted)
  return jax.ops.segment_sum(expanded, flat,
                             num_segments=meta.groups * 8,
                             indices_are_sorted=True)


def _rmw_dense_xla(table, ids, grads, hypers, math_fn, meta: PackMeta):
  """Whole-table streaming update: dense grad build + one fused
  elementwise/matmul pass over [groups*8, W]. No DMA issues, no
  scatters; the touched-row mask (summed grad != 0) keeps the lazy
  row-granular semantics identical to the kernel and grouped paths."""
  w = meta.width
  gg = _dense_prep(ids, grads, meta)
  hvec = jnp.zeros((_LANE,), jnp.float32).at[:hypers.shape[0]].set(
      hypers.astype(jnp.float32))
  e0t = jnp.asarray(
      _extract_matrix(w, meta.cc, meta.dim, 0, meta.part_width)).T
  tm = jnp.asarray(_touch_matrix(w, meta.cc)).astype(jnp.bfloat16)
  new = _math_and_mask(table.astype(jnp.float32), gg,
                       lambda k: hvec[k], math_fn, meta, tm, e0t,
                       lambda x, sh: jnp.roll(x, sh, axis=1))
  return new.astype(table.dtype)


def _rmw_xla(table, ugids, gg, hypers, math_fn, meta: PackMeta):
  """Fallback (CPU tests, unsupported backends): XLA group gather +
  shared math + group .set. Numerics identical to the kernel."""
  n = ugids.shape[0]
  w = meta.width
  dnums = jax.lax.GatherDimensionNumbers(
      offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
  gids_c = jnp.minimum(ugids, meta.groups - 1)
  old = jax.lax.gather(table, (gids_c * 8)[:, None], dnums, (8, w),
                       mode='clip').astype(jnp.float32).reshape(n * 8, w)
  hvec = jnp.zeros((_LANE,), jnp.float32).at[:hypers.shape[0]].set(
      hypers.astype(jnp.float32))
  e0t = jnp.asarray(
      _extract_matrix(w, meta.cc, meta.dim, 0, meta.part_width)).T
  tm = jnp.asarray(_touch_matrix(w, meta.cc)).astype(jnp.bfloat16)
  new = _math_and_mask(old,
                       gg.reshape(n * 8, meta.part_width)
                       .astype(jnp.float32),
                       lambda k: hvec[k], math_fn, meta, tm, e0t,
                       lambda x, s: jnp.roll(x, s, axis=1))
  t3 = table.reshape(meta.groups, 8, w)
  # sentinel padding entries (ugids == groups) are OOB and get DROPPED —
  # they must never duplicate (nondeterministically race) a live group
  out = t3.at[ugids].set(new.reshape(n, 8, w).astype(table.dtype),
                         mode='drop')
  return out.reshape(meta.phys_rows, w)


def apply_packed_update(table: jnp.ndarray,
                        ids: jnp.ndarray,
                        grads: jnp.ndarray,
                        hypers: jnp.ndarray,
                        math_fn: Callable,
                        meta: PackMeta,
                        use_pallas: bool,
                        interpret: bool = False,
                        predicate: bool = False) -> jnp.ndarray:
  """Sparse-update one combined packed table from raw (duplicated) ids
  [N] and their gradients [N, dim].

  hypers: [K] f32 traced scalars for math_fn (static hyperparameters are
  baked into the optimizer closure). math_fn = SparseOptimizer.block_math
  operating on compact per-part f32 views; hyp is a callable k->scalar.
  """
  # saturated tables (id slots >= groups) CAN update densely — one
  # streaming pass, no dedup/DMAs — but measured SLOWER on v5e (wide
  # table: 20.3 vs 14.2 ms/step in-step; the full-width math
  # temporaries + HIGHEST-precision selector matmul over every group
  # cost more than the DMAs they replace). Kept as an opt-in.
  if (ids.shape[0] >= meta.groups and
      _os.environ.get('EASYREC_PACKED_DENSE', '0') == '1'):
    return _rmw_dense_xla(table, ids, grads, hypers, math_fn, meta)
  if ((use_pallas or interpret) and
      _os.environ.get('EASYREC_PACKED_FUSED', '0') == '1'):
    ugids, expanded, flat, _cap = _prep_sorted(ids, grads, meta)
    return _rmw_fused_pallas(table, ugids, expanded, flat, hypers,
                             math_fn, meta, interpret=interpret,
                             predicate=predicate)
  ugids, gg = group_prep(ids, grads, meta, use_pallas=use_pallas,
                         interpret=interpret)
  if use_pallas or interpret:
    return _rmw_pallas(table, ugids, gg, hypers, math_fn, meta,
                       interpret=interpret, predicate=predicate)
  return _rmw_xla(table, ugids, gg, hypers, math_fn, meta)
