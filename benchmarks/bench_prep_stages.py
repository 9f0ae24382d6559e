"""Stage-level timing of the packed-update prep at REAL model shapes.

The r2 ablation pinned prep (argsort dedup + lane expansion + sorted
segment-sum) at ~6.2 ms of the 18.7 ms DeepFM step; the r3 DIN ablation
shows ~18 ms at the Taobao DIN shape (N jumps 107k -> 471k ids/step from
the two len-50 behavior sequences). This bench isolates WHICH stage
scales badly before we spend a kernel on the wrong one.

Run on TPU: PYTHONPATH=.:... python benchmarks/bench_prep_stages.py
Env: BENCH_MODELS=deepfm,din
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


def stage_sort(ids, grads, meta):
  order = jnp.argsort(ids)
  return jnp.take(ids, order), jnp.take(grads, order, axis=0)


def stage_expand(sids, sgrads, meta):
  within = sids % meta.group_rows
  lane = within % meta.pack
  live = meta.pack * meta.dim
  tiled = jnp.tile(sgrads.astype(jnp.float32), (1, live // meta.dim))
  q = jnp.arange(live, dtype=jnp.int32)
  sel = (q // meta.dim)[None, :] == lane[:, None]
  expanded = jnp.where(sel, tiled, 0.0)
  pw = meta.part_width
  if pw != live:
    expanded = jnp.concatenate(
        [expanded, jnp.zeros((sids.shape[0], pw - live), jnp.float32)],
        axis=1)
  return expanded


def stage_flat(sids, meta):
  gids = sids // meta.group_rows
  sub = (sids % meta.group_rows) // meta.pack
  first = jnp.concatenate([jnp.ones((1,), bool), gids[1:] != gids[:-1]])
  gseg = jnp.cumsum(first) - 1
  return gseg * 8 + sub


def stage_segsum(expanded, flat, cap8):
  return jax.ops.segment_sum(expanded, flat, num_segments=cap8,
                             indices_are_sorted=True)


def stage_segsum_unsorted(expanded, flat, cap8):
  return jax.ops.segment_sum(expanded, flat, num_segments=cap8,
                             indices_are_sorted=False)


def narrow_then_expand(sids, sgrads, meta, ucap):
  """Two-stage alternative: collapse duplicate IDS at native dim first
  (cheap rows), then expand + segment-sum only the unique rows."""
  first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
  useg = jnp.cumsum(first) - 1
  narrow = jax.ops.segment_sum(sgrads.astype(jnp.float32), useg,
                               num_segments=ucap,
                               indices_are_sorted=True)
  uids = jnp.full((ucap,), meta.rows_padded - 1, sids.dtype
                  ).at[useg].set(sids, mode='drop')
  expanded = stage_expand(uids, narrow, meta)
  flat = stage_flat(uids, meta)
  _SEG_B = pt._seg_b()
  q = _SEG_B // 8
  cap = min(-(-ucap // q) * q, meta.groups)
  return stage_segsum(expanded, flat, cap * 8)


def main():
  models = os.environ.get('BENCH_MODELS', 'deepfm,din').split(',')
  for name in models:
    if name == 'deepfm':
      cfg = flagship.criteo_deepfm_config(batch_size=4096)
      labels = ['label']
    else:
      cfg = getattr(flagship, 'taobao_%s_config' % name)(batch_size=4096)
      labels = ['clk', 'buy'] if name == 'mmoe' else ['clk']
    trainer = Trainer(cfg)
    batch = synthetic_batch(trainer.specs, labels, 4096, seed=0)
    layout = trainer.layout
    packs = jax.jit(functools.partial(emb_ops.pack_all_views, layout))(
        batch)
    for key, meta in (trainer.pack_metas or {}).items():
      ids = jnp.asarray(packs[key]).reshape(-1)
      n = ids.shape[0]
      uniq = int(np.unique(np.asarray(ids)).size)
      grads = jax.random.normal(jax.random.PRNGKey(1), (n, meta.dim),
                                jnp.float32)
      print('\n== %s / %s: N=%d unique=%d %s' % (name, key, n, uniq, meta))

      t = t_simple(jax.jit(
          functools.partial(pt.group_prep, meta=meta)), ids, grads)
      print('  group_prep (all)        : %8.2f ms' % (t * 1e3))

      sort_j = jax.jit(functools.partial(stage_sort, meta=meta))
      t = t_simple(sort_j, ids, grads)
      print('  argsort + takes         : %8.2f ms' % (t * 1e3))
      sids, sgrads = sort_j(ids, grads)

      t = t_simple(jax.jit(
          functools.partial(stage_expand, meta=meta)), sids, sgrads)
      print('  lane expansion          : %8.2f ms' % (t * 1e3))
      expanded = jax.jit(
          functools.partial(stage_expand, meta=meta))(sids, sgrads)
      flat = jax.jit(functools.partial(stage_flat, meta=meta))(sids)
      _SEG_B = pt._seg_b()
      q = _SEG_B // 8
      cap = min(-(-n // q) * q, meta.groups)

      t = t_simple(jax.jit(functools.partial(
          stage_segsum, cap8=cap * 8)), expanded, flat)
      print('  segsum sorted  [N,%3d]  : %8.2f ms (%d->%d rows)'
            % (expanded.shape[1], t * 1e3, n, cap * 8))

      t = t_simple(jax.jit(functools.partial(
          stage_segsum_unsorted, cap8=cap * 8)), expanded, flat)
      print('  segsum unsorted         : %8.2f ms' % (t * 1e3))

      # two-stage with ucap at 1.25x measured uniques (round to 512)
      ucap = min(-(-int(uniq * 1.25) // 512) * 512, n)
      t = t_simple(jax.jit(functools.partial(
          narrow_then_expand, meta=meta, ucap=ucap)), sids, sgrads)
      print('  two-stage (ucap=%6d) : %8.2f ms' % (ucap, t * 1e3))


if __name__ == '__main__':
  main()
