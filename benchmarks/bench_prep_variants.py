"""Fused end-to-end variants of the packed-update prep (TPU).

bench_prep_stages showed the argsort+takes is ~60% of group_prep
(DeepFM 4.9/8.2 ms at N=160k; DIN 10.6/16.1 ms at N=471k). Candidates:

  v0 current    argsort -> dedup ranks -> expand -> sorted segsum
  v1 nosort     physical row = id -> (gid*8+sub) directly, UNSORTED
                segment-sum into groups*8 rows; only sane when
                cap == groups (small tables: DIN's 19.4k groups)
  v2 presorted  the sort permutation arrives precomputed (host does a
                radix sort in the input pipeline, hidden behind the
                prefetch pipeline); device does takes + sorted segsum

Prints per-model/table timings + the host-side np.argsort cost that v2
would move off-device.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.ops import embedding as emb_ops
from easyrec_tpu.ops import packed_table as pt
from easyrec_tpu.train.trainer import Trainer
from easyrec_tpu.utils import flagship
from easyrec_tpu.utils.synthetic import synthetic_batch


def sync(x):
  jax.block_until_ready(x)
  leaf = jax.tree_util.tree_leaves(x)[0]
  _ = np.asarray(jax.device_get(leaf)).ravel()[0]


def t_simple(fn, *args, iters=20):
  for _ in range(3):
    out = fn(*args)
  sync(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  sync(out)
  return (time.perf_counter() - t0) / iters


def _expand(sgrads, lane, meta):
  live = meta.pack * meta.dim
  tiled = jnp.tile(sgrads.astype(jnp.float32), (1, live // meta.dim))
  q = jnp.arange(live, dtype=jnp.int32)
  sel = (q // meta.dim)[None, :] == lane[:, None]
  expanded = jnp.where(sel, tiled, 0.0)
  pw = meta.part_width
  if pw != live:
    expanded = jnp.concatenate(
        [expanded, jnp.zeros((sgrads.shape[0], pw - live), jnp.float32)],
        axis=1)
  return expanded


def prep_nosort(ids, grads, meta):
  within = ids % meta.group_rows
  lane = within % meta.pack
  expanded = _expand(grads, lane, meta)
  flat = (ids // meta.group_rows) * 8 + within // meta.pack
  gg = jax.ops.segment_sum(expanded, flat, num_segments=meta.groups * 8)
  return jnp.arange(meta.groups, dtype=jnp.int32), \
      gg.reshape(meta.groups, 8, meta.part_width)


def prep_nosort_narrow(ids, grads, meta):
  """Physical row-major layout means gg[g, sub, lane*dim+d] ==
  dense_grad[id, d] exactly: one NARROW unsorted segment-sum keyed by
  the raw id, then a pure reshape + lane pad. No sort, no expand."""
  dense = jax.ops.segment_sum(grads.astype(jnp.float32), ids,
                              num_segments=meta.rows_padded)
  gg = dense.reshape(meta.groups, 8, meta.pack * meta.dim)
  pw = meta.part_width
  if pw != meta.pack * meta.dim:
    gg = jnp.concatenate(
        [gg, jnp.zeros(gg.shape[:2] + (pw - meta.pack * meta.dim,),
                       jnp.float32)], axis=-1)
  return jnp.arange(meta.groups, dtype=jnp.int32), gg


def prep_presorted(sids, perm, grads, meta):
  """Identical to pt._prep_sorted but the sort itself happened upstream
  (host): only the grad gather + rank/expand/segsum run on device."""
  sgrads = jnp.take(grads, perm, axis=0)
  n = sids.shape[0]
  gids = sids // meta.group_rows
  within = sids % meta.group_rows
  sub = within // meta.pack
  lane = within % meta.pack
  first = jnp.concatenate([jnp.ones((1,), bool), gids[1:] != gids[:-1]])
  gseg = jnp.cumsum(first) - 1
  _SEG_B = pt._seg_b()
  q = _SEG_B // 8
  cap = min(-(-n // q) * q, meta.groups)
  ugids = jnp.full((cap,), meta.groups,
                   gids.dtype).at[gseg].set(gids, mode='drop')
  expanded = _expand(sgrads, lane, meta)
  flat = gseg * 8 + sub
  gg = jax.ops.segment_sum(expanded, flat, num_segments=cap * 8,
                           indices_are_sorted=True)
  return ugids, gg.reshape(cap, 8, meta.part_width)


def main():
  models = os.environ.get('BENCH_MODELS', 'din,deepfm').split(',')
  for name in models:
    if name == 'deepfm':
      cfg = flagship.criteo_deepfm_config(batch_size=4096)
      labels = ['label']
    else:
      cfg = getattr(flagship, 'taobao_%s_config' % name)(batch_size=4096)
      labels = ['clk', 'buy'] if name == 'mmoe' else ['clk']
    trainer = Trainer(cfg)
    batch = synthetic_batch(trainer.specs, labels, 4096, seed=0)
    packs = jax.jit(functools.partial(emb_ops.pack_all_views,
                                      trainer.layout))(batch)
    for key, meta in (trainer.pack_metas or {}).items():
      ids = jnp.asarray(packs[key]).reshape(-1)
      n = int(ids.shape[0])
      grads = jax.random.normal(jax.random.PRNGKey(1), (n, meta.dim),
                                jnp.float32)
      print('\n== %s / %s: N=%d %s' % (name, key, n, meta))

      v0 = jax.jit(functools.partial(pt.group_prep, meta=meta))
      t0 = t_simple(v0, ids, grads)
      print('  v0 current           : %8.2f ms' % (t0 * 1e3))
      ug0, gg0 = jax.tree_util.tree_map(np.asarray, v0(ids, grads))

      host_ids = np.asarray(ids)
      tH = time.perf_counter()
      for _ in range(5):
        perm_np = np.argsort(host_ids, kind='stable')
      tH = (time.perf_counter() - tH) / 5
      print('  host np.argsort      : %8.2f ms (moves off device)'
            % (tH * 1e3))
      perm = jnp.asarray(perm_np.astype(np.int32))
      sids = jnp.asarray(host_ids[perm_np])
      v2 = jax.jit(functools.partial(prep_presorted, meta=meta))
      t2 = t_simple(v2, sids, perm, grads)
      print('  v2 presorted (device): %8.2f ms' % (t2 * 1e3))
      ug2, gg2 = jax.tree_util.tree_map(np.asarray, v2(sids, perm, grads))
      assert np.array_equal(ug0, ug2)
      print('  v2 parity            : max|d|=%.2e'
            % np.max(np.abs(gg0 - gg2)))

      if meta.groups * 8 * meta.part_width * 4 < 300 << 20:
        v1 = jax.jit(functools.partial(prep_nosort, meta=meta))
        t1 = t_simple(v1, ids, grads)
        print('  v1 nosort            : %8.2f ms (output %d groups)'
              % (t1 * 1e3, meta.groups))
        ug1, gg1 = jax.tree_util.tree_map(np.asarray, v1(ids, grads))
        # parity: scatter gg0 rows (by ug0) into a dense [groups] image
        dense = np.zeros_like(gg1)
        live = ug0 < meta.groups
        dense[ug0[live]] += gg0[live]
        print('  v1 parity            : max|d|=%.2e'
              % np.max(np.abs(dense - gg1)))

        v1n = jax.jit(functools.partial(prep_nosort_narrow, meta=meta))
        t1n = t_simple(v1n, ids, grads)
        print('  v1n narrow-reshape   : %8.2f ms' % (t1n * 1e3))
        _, gg1n = jax.tree_util.tree_map(np.asarray, v1n(ids, grads))
        print('  v1n parity           : max|d|=%.2e'
              % np.max(np.abs(dense - gg1n)))


if __name__ == '__main__':
  main()
