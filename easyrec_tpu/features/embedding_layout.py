"""Embedding layout: fuse all same-dim tables into one matrix per dim.

TPU-first replacement for the reference's per-column embedding variables
(compat/feature_column/feature_column_v2.py): instead of one gather per
feature column, every embedding table with the same dim is stacked into one
fused [total_rows, dim] matrix with per-table row offsets. A train step then
performs ONE big gather (and one sparse update) per dim-group, which XLA
tiles far better than dozens of small ones, and which shards cleanly:
row-shard the fused matrix over the mesh and the gather becomes an
all-to-all exchange (the reference's EmbeddingParallel hvd.alltoall path,
compat/feature_column/feature_column.py:248-357, done by the XLA partitioner
instead of hand-written collectives).

Wide columns are embeddings too (dim = wide_output_dim, sum combiner), as in
the reference (feature_column.py:596-623), so they fuse the same way.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Tuple

import numpy as np

from easyrec_tpu.features.feature_spec import FeatureSpec

# every fused table gets one trailing scratch row: padded slots in the
# deduplicated sparse update scatter into it so real rows never see
# zero-gradient optimizer noise
SCRATCH_ROWS = 1


@dataclasses.dataclass
class TableUse:
  """One feature's slice inside a fused table's packed id axis."""
  feature: str
  role: str          # 'deep' | 'wide'
  k: int             # number of id slots ([B, k] ids)
  offset: int        # row offset of this feature's table inside the fusion
  start: int         # start column inside the fused [B, tot_k] id pack
  is_sequence: bool = False
  # merged wide-into-deep tables: this use reads a COLUMN slice of the
  # pulled rows (deep cols [0:D), wide col(s) [D:D+W)); 0 = full dim
  col_start: int = 0
  col_dim: int = 0


@dataclasses.dataclass
class FusedTable:
  key: str                       # e.g. 'emb16' / 'wide1'
  dim: int                       # PHYSICAL column count (may be padded)
  rows: int                      # total rows incl. scratch row
  offsets: Dict[str, int]        # member table_name -> row offset
  member_rows: Dict[str, int]
  uses: List[TableUse] = dataclasses.field(default_factory=list)
  stddev: Dict[str, float] = dataclasses.field(default_factory=dict)
  # merged tables: cols [0:used_dim) are live (deep D + wide W), the
  # rest is 128-lane-alignment padding (zero-init, zero-grad, untouched)
  used_dim: int = 0

  @property
  def tot_k(self) -> int:
    return sum(u.k for u in self.uses)


class EmbeddingLayout:
  """Builds fused tables from feature specs + their group roles."""

  def __init__(self,
               specs: Dict[str, FeatureSpec],
               deep_features: Iterable[str],
               wide_features: Iterable[str] = (),
               wide_output_dim: int = 4,
               seq_features: Iterable[str] = ()):
    self.specs = specs
    self.wide_output_dim = wide_output_dim
    self.tables: Dict[str, FusedTable] = {}
    # (feature, role) -> (table_key, TableUse)
    self.feature_use: Dict[Tuple[str, str], Tuple[str, TableUse]] = {}

    deep = list(dict.fromkeys(list(deep_features) + list(seq_features)))
    wide = list(dict.fromkeys(wide_features))

    # collect member tables per fused dim group
    plans: Dict[str, List[Tuple[str, str, FeatureSpec]]] = {}
    for fname in deep:
      spec = specs[fname]
      if spec.kind == 'dense' or spec.seq_is_dense:
        continue
      if spec.embedding_dim <= 0:
        raise ValueError('feature %s has no embedding_dim but is used in a '
                         'deep group' % fname)
      key = 'emb%d' % spec.embedding_dim
      plans.setdefault(key, []).append((fname, 'deep', spec))
    for fname in wide:
      spec = specs[fname]
      if spec.kind == 'dense':
        continue
      key = 'wide%d' % wide_output_dim
      plans.setdefault(key, []).append((fname, 'wide', spec))

    # -- wide-into-deep merge: a wide feature that ALSO has a deep use
    # shares the deep table's vocab rows, so its wide weights can live
    # as extra COLUMNS of the same rows — one pull + one sparse update
    # instead of two (on the flagship DeepFM this removes the entire
    # [26M, 1] wide table: step 29.5 -> ~22 ms, PERF.md r2). The merged
    # physical dim pads to the next packed-layout-friendly width.
    import os as _os
    self.merged_wide: Dict[str, Tuple[str, int]] = {}
    if _os.environ.get('EASYREC_MERGE_WIDE', '1') != '0':
      deep_feats = {f for k, ms in plans.items() if k.startswith('emb')
                    for f, _, _ in ms}
      for wkey in [k for k in plans if k.startswith('wide')]:
        keep = []
        for fname, role, spec in plans[wkey]:
          dkey = 'emb%d' % spec.embedding_dim
          pad = _merged_pad_dim(spec.embedding_dim + wide_output_dim)
          if fname in deep_feats and dkey in plans and pad:
            # wide cols [D : D+W) of the deep table's rows
            self.merged_wide[fname] = (dkey, spec.embedding_dim)
          else:
            keep.append((fname, role, spec))
        if keep:
          plans[wkey] = keep
        else:
          del plans[wkey]

    for key, members in plans.items():
      dim = members[0][2].embedding_dim if not key.startswith('wide') \
          else wide_output_dim
      merged_here = [f for f, (k2, _) in self.merged_wide.items()
                     if k2 == key]
      used_dim = dim + (wide_output_dim if merged_here else 0)
      phys_dim = _merged_pad_dim(used_dim) if merged_here else dim
      offsets: Dict[str, int] = {}
      member_rows: Dict[str, int] = {}
      stddev: Dict[str, float] = {}
      next_row = 0
      uses: List[TableUse] = []
      start = 0
      for fname, role, spec in members:
        tname = spec.table_name if role == 'deep' else \
            spec.table_name + '__wide'
        if tname not in offsets:
          offsets[tname] = next_row
          member_rows[tname] = spec.rows
          stddev[tname] = _init_stddev(spec, dim)
          next_row += spec.rows
        use = TableUse(feature=fname, role=role, k=spec.num_ids,
                       offset=offsets[tname], start=start,
                       is_sequence=(spec.kind == 'sequence'),
                       col_start=0,
                       col_dim=dim if merged_here else 0)
        uses.append(use)
        start += spec.num_ids
        self.feature_use[(fname, role)] = (key, use)
        if fname in merged_here:
          # the wide role reads cols [dim : dim+W) of the SAME pulled
          # rows — no extra pack slots, no second table
          self.feature_use[(fname, 'wide')] = (key, TableUse(
              feature=fname, role='wide', k=spec.num_ids,
              offset=offsets[tname], start=use.start,
              is_sequence=use.is_sequence,
              col_start=dim, col_dim=wide_output_dim))
      table = FusedTable(key=key, dim=phys_dim,
                         rows=next_row + SCRATCH_ROWS,
                         offsets=offsets, member_rows=member_rows,
                         uses=uses, stddev=stddev,
                         used_dim=used_dim if merged_here else dim)
      self.tables[key] = table

  # -- init ----------------------------------------------------------------

  def init_tables(self, rng_seed: int = 0, dtype=np.float32,
                  pad_rows_to: int = 1) -> Dict[str, np.ndarray]:
    """Materialize fused tables as numpy arrays (host init, then shard).
    Seeds derive from crc32(key) — NOT hash(), which is salted per
    interpreter and would break cross-run/cross-host reproducibility."""
    import zlib
    out = {}
    for key, t in self.tables.items():
      rows = _round_up(t.rows, pad_rows_to)
      rng = np.random.default_rng(
          rng_seed ^ zlib.crc32(key.encode()) & 0xffffffff)
      arr = np.zeros((rows, t.dim), dtype=dtype)
      used = t.used_dim or t.dim
      for tname, off in t.offsets.items():
        n = t.member_rows[tname]
        arr[off:off + n, :used] = rng.normal(
            0.0, t.stddev[tname], size=(n, used)).astype(dtype)
      out[key] = arr
    return out

  def init_tables_on_device(self, rng_seed: int = 0,
                            pad_rows_to: int = 1,
                            sharding=None) -> Dict[str, object]:
    """Initialize fused tables ON DEVICE (jax.random.normal under jit,
    output sharded in place).

    Host numpy init + H2D of a 26M x 16 f32 table is ~1.7 GB over the
    host link (175 s measured through the axon tunnel); generating on
    device is a ~10 s compile + sub-second kernel. The per-row stddev is
    one searchsorted gather over segment starts (27 slice-updates on a
    26M-row array compile pathologically slowly).
    """
    import zlib

    import jax
    import jax.numpy as jnp

    out = {}
    for key, t in self.tables.items():
      rows = _round_up(t.rows, pad_rows_to)
      segments = tuple(sorted(
          (off, off + t.member_rows[name], float(t.stddev[name]))
          for name, off in t.offsets.items()))
      seed = rng_seed ^ (zlib.crc32(key.encode()) & 0x7fffffff)

      starts = jnp.asarray([s for s, _, _ in segments] + [rows], jnp.int32)
      stds = jnp.asarray([sd for _, _, sd in segments] + [0.0], jnp.float32)
      ends = jnp.asarray([e for _, e, _ in segments] + [rows], jnp.int32)

      # seed passed as a real argument (an argument-less jit would retain
      # its output in the executable cache)
      used = t.used_dim or t.dim

      def _init(seed_arr, rows=rows, dim=t.dim, starts=starts, stds=stds,
                ends=ends, used=used):
        arr = jax.random.normal(jax.random.PRNGKey(seed_arr[0]),
                                (rows, dim), jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        seg = jnp.searchsorted(starts, row[:, 0], side='right') - 1
        std = jnp.take(stds, seg)
        # zero inter-segment padding (alignment gaps, scratch rows)
        in_seg = row[:, 0] < jnp.take(ends, seg)
        scale = jnp.where(in_seg, std, 0.0)[:, None]
        if used < dim:
          col = jax.lax.broadcasted_iota(jnp.int32, (rows, dim), 1)
          scale = jnp.where(col < used, scale, 0.0)
        return arr * scale

      fn = jax.jit(_init, out_shardings=sharding)
      out[key] = fn(jnp.asarray([seed], jnp.uint32))
    return out

  def scratch_row(self, key: str) -> int:
    return self.tables[key].rows - SCRATCH_ROWS

  # -- packed layout (TPU Mosaic update path, ops/packed_table.py) ---------

  def pack_metas(self, n_parts: int = 1, pad_rows_to: int = 1,
                 shards: int = 1, compact: bool = False):
    """PackMeta per fused table. n_parts = 1 + optimizer slot count:
    weights and slots live interleaved in one combined array; packed
    mode's own scratch group replaces the trailing scratch row. shards
    rounds the group count so row-sharding splits evenly. compact packs
    2-slot optimizers' moments as bf16 pairs (half the row width)."""
    from easyrec_tpu.ops.packed_table import PackMeta
    # dim-1 (wide) tables stay 3-part: at width 128 they become DMA-
    # issue-bound (2x the groups of the 384-wide layout for the same
    # bytes saved — measured slower on v5e); compact only pays when the
    # row is wide enough that traffic, not issue count, dominates
    return {key: PackMeta(_round_up(t.rows, pad_rows_to), t.dim, n_parts,
                          shards=shards,
                          compact=compact and t.dim > 1)
            for key, t in self.tables.items()}

  def packed_supported(self, n_parts: int = 1,
                       compact: bool = False) -> bool:
    from easyrec_tpu.ops import packed_table as pt
    return all(pt.supported(t.dim, n_parts, compact=compact)
               for t in self.tables.values())

  def init_packed_tables_on_device(self, rng_seed: int = 0,
                                   n_parts: int = 1,
                                   slot_init=(),
                                   pad_rows_to: int = 1,
                                   shards: int = 1,
                                   sharding=None,
                                   compact: bool = False
                                   ) -> Dict[str, object]:
    """Initialize combined packed tables ON DEVICE: each (phys_row, col)
    maps back to its logical row + part; part 0 (weights) draws from the
    per-member-table stddev (searchsorted), slot parts fill with the
    optimizer's slot_init constants, padding/scratch zeroed."""
    import zlib

    import jax
    import jax.numpy as jnp

    metas = self.pack_metas(n_parts, pad_rows_to, shards=shards,
                            compact=compact)
    if compact:
      import numpy as _np

      from easyrec_tpu.ops.packed_table import np_pack_pair
      si = list(slot_init) + [0.0] * (2 - len(slot_init))
      fill = float(np_pack_pair(_np.float32([si[0]]),
                                _np.float32([si[1]]))[0])
      slot_vals = [0.0, fill]
    else:
      slot_vals = [0.0] + list(slot_init) + \
          [0.0] * (n_parts - 1 - len(slot_init))
    out = {}
    for key, t in self.tables.items():
      meta = metas[key]
      segments = tuple(sorted(
          (off, off + t.member_rows[name], float(t.stddev[name]))
          for name, off in t.offsets.items()))
      seed = rng_seed ^ (zlib.crc32(key.encode()) & 0x7fffffff)
      starts = jnp.asarray([s for s, _, _ in segments] + [meta.rows_padded],
                           jnp.int32)
      stds = jnp.asarray([sd for _, _, sd in segments] + [0.0], jnp.float32)
      ends = jnp.asarray([e for _, e, _ in segments] + [meta.rows_padded],
                         jnp.int32)
      svals = jnp.asarray(slot_vals, jnp.float32)

      svals_k = svals if meta.compact or not compact else jnp.asarray(
          [0.0] + list(slot_init) +
          [0.0] * (n_parts - 1 - len(slot_init)), jnp.float32)

      used = t.used_dim or t.dim
      # chunked generation: a single whole-table jax.random.normal holds
      # 2-3x the table in intermediates (rng bits + masks) — a 6.7 GB
      # merged flagship table OOMed 16 GB HBM at init. fori_loop chunks
      # keep the peak at table + one chunk. phys_rows is a multiple of
      # 2048 (groups round to 256); target ~256 MB chunks.
      phys = meta.phys_rows
      target = max(1, (256 << 20) // (meta.width * 4) // 2048) * 2048
      n_chunks = -(-phys // target)
      while phys % n_chunks or (phys // n_chunks) % 2048:
        n_chunks += 1
      chunk_rows = phys // n_chunks

      def _init(seed_arr, meta=meta, starts=starts, stds=stds, ends=ends,
                svals=svals_k, used=used, chunk_rows=chunk_rows,
                n_chunks=n_chunks):
        def fill(i, out):
          base = i * chunk_rows
          key_i = jax.random.fold_in(
              jax.random.PRNGKey(seed_arr[0]), i)
          arr = jax.random.normal(key_i, (chunk_rows, meta.width),
                                  jnp.float32)
          prow = jax.lax.broadcasted_iota(
              jnp.int32, (chunk_rows, meta.width), 0) + base
          col = jax.lax.broadcasted_iota(
              jnp.int32, (chunk_rows, meta.width), 1)
          logical = ((prow // 8) * meta.group_rows +
                     (prow % 8) * meta.pack + col // meta.cc)
          part = (col % meta.cc) // meta.dim
          seg = jnp.searchsorted(starts, logical, side='right') - 1
          std = jnp.take(stds, seg)
          in_seg = logical < jnp.take(ends, seg)
          # merged tables: part-0 lanes past used_dim are alignment pad
          live_lane = (col % meta.cc) % meta.dim < used \
              if used < meta.dim else True
          weights = arr * jnp.where(in_seg & live_lane, std, 0.0)
          slot_fill = jnp.where(in_seg, jnp.take(svals, part), 0.0)
          vals = jnp.where(part == 0, weights, slot_fill)
          return jax.lax.dynamic_update_slice(out, vals, (base, 0))

        out0 = jnp.zeros((phys, meta.width), jnp.float32)
        return jax.lax.fori_loop(0, n_chunks, fill, out0)

      fn = jax.jit(_init, out_shardings=sharding)
      out[key] = fn(jnp.asarray([seed], jnp.uint32))
    return out


def _merged_pad_dim(used: int):
  """Smallest physical dim >= used whose packed widths stay within the
  kernel's MAX_WIDTH for both the compact (2-part) and full (3-part)
  layouts; None when no such dim exists (merge is then skipped)."""
  from easyrec_tpu.ops.packed_table import supported
  for p in (16, 32, 64, 128):
    if p >= used and supported(p, 3) and supported(p, 3, compact=True):
      return p
  return None


def _init_stddev(spec: FeatureSpec, dim: int) -> float:
  config = spec.config
  if config is not None and config.HasField('ev_params') and \
      config.ev_params.filter_freq > 0:
    # EV semantics: an id has NO embedding until admitted — zero-init
    # so unadmitted ids read the EV default everywhere (features/ev.py)
    return 0.0
  if config is not None and config.HasField('initializer'):
    init = config.initializer
    which = init.WhichOneof('initializer_oneof')
    if which == 'truncated_normal_initializer':
      return init.truncated_normal_initializer.stddev
    if which == 'random_normal_initializer':
      return init.random_normal_initializer.stddev
    if which == 'glorot_normal_initializer':
      return float(np.sqrt(2.0 / (spec.rows + dim)))
    if which == 'constant_initializer':
      return 0.0
  # default: 0.01/sqrt(dim) — the REFERENCE's embedding_column default
  # (compat/feature_column/feature_column_v2.py:911-912,
  # truncated_normal(stddev=0.01/sqrt(dimension))). r1-r3 used
  # 1/sqrt(dim) (100x larger); the calibrated proxy benchmark caught it
  # as a 5.6-point AUC gap vs an independent torch implementation at
  # the 1-epoch criteo protocol (PERF.md r4 quality proxy).
  return float(0.01 / np.sqrt(dim))


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m
