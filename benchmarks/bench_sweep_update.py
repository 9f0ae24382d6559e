"""One-session TPU sweep of the packed-update tuning space.

Times, at flagship shapes (26 x 4096 ids over a [26M,16]x3-part deep
table and a [26M,1]x3-part wide table):
  1. group_prep with the XLA segment-sum (baseline)
  2. group_prep with the Mosaic segmented-sum over (B, T, stack) configs
  3. the RMW kernel with pipeline off/on and a couple of chunk budgets

Env knobs are read at TRACE time, so each config gets a fresh jit.
  4. end-to-end apply_packed_update: fused in-kernel segment-sum vs
     the split prep+RMW path
Run: python benchmarks/bench_sweep_update.py [deep|wide|rmw|e2e|all]
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.ops import packed_table as pt
from easyrec_tpu.optim import sparse as sparse_lib


def sync(x):
  jax.block_until_ready(x)
  leaf = jax.tree_util.tree_leaves(x)[0]
  _ = float(leaf[(0,) * leaf.ndim])


def t_simple(fn, *args, iters=10):
  for _ in range(3):
    out = fn(*args)
  sync(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  sync(out)
  return (time.perf_counter() - t0) / iters


def seg_sweep(meta, n_ids, tag):
  key = jax.random.PRNGKey(0)
  ids = jax.random.randint(key, (n_ids,), 0, meta.rows, jnp.int32)
  grads = jax.random.normal(key, (n_ids, meta.dim), jnp.float32)

  prep = jax.jit(functools.partial(pt.group_prep, meta=meta))
  base = t_simple(prep, ids, grads)
  print(f'[{tag}] group_prep XLA-segsum         : {base*1e3:8.2f} ms',
        flush=True)
  ref = prep(ids, grads)

  os.environ['EASYREC_SEG_SUM_KERNEL'] = '1'
  for b, t, stk in [(2048, 256, 0), (2048, 256, 1), (2048, 512, 0),
                    (4096, 256, 0), (4096, 512, 0), (1024, 256, 0),
                    (2048, 128, 0), (512, 64, 0)]:
    os.environ['EASYREC_SEG_SUM_B'] = str(b)
    os.environ['EASYREC_SEG_SUM_T'] = str(t)
    os.environ['EASYREC_SEG_SUM_STACK'] = str(stk)
    prep_k = jax.jit(functools.partial(pt.group_prep, meta=meta,
                                       use_pallas=True))
    try:
      tk = t_simple(prep_k, ids, grads)
      out = prep_k(ids, grads)
      d = float(jnp.max(jnp.abs(out[1] - ref[1])))
      print(f'[{tag}] Mosaic B={b:5d} T={t:4d} stk={stk}: '
            f'{tk*1e3:8.2f} ms   (maxdiff {d:.1e})', flush=True)
    except Exception as e:  # compile-helper crashes etc.
      print(f'[{tag}] Mosaic B={b:5d} T={t:4d} stk={stk}: FAILED '
            f'{type(e).__name__}: {str(e)[:120]}', flush=True)
  for k in ('EASYREC_SEG_SUM_KERNEL', 'EASYREC_SEG_SUM_B',
            'EASYREC_SEG_SUM_T', 'EASYREC_SEG_SUM_STACK'):
    os.environ.pop(k, None)


def rmw_sweep(meta, n_ids, tag):
  key = jax.random.PRNGKey(0)
  ids = jax.random.randint(key, (n_ids,), 0, meta.rows, jnp.int32)
  grads = jax.random.normal(key, (n_ids, meta.dim), jnp.float32)
  opt = sparse_lib.sparse_adam()
  lr, st = jnp.float32(1e-3), jnp.int32(5)
  ugids, gg = jax.jit(functools.partial(pt.group_prep, meta=meta))(
      ids, grads)
  # abs(): the packed layout interleaves Adam v-slots into this array;
  # negative v would make sqrt(v) NaN and poison the parity check.
  # compact metas pack v as the LOW bf16 of each pair lane — raw random
  # f32 bits decode to negative v, so build those lanes via pack_pair.
  if getattr(meta, 'compact', False):
    def mk(k):
      w = jnp.abs(jax.random.normal(
          k, (meta.phys_rows, meta.width), jnp.float32)) * 0.01
      col = jax.lax.broadcasted_iota(
          jnp.int32, (meta.phys_rows, meta.width), 1)
      mv = sparse_lib.pack_pair(w * 0.1, w)      # m small, v >= 0
      return jnp.where((col % meta.cc) < meta.dim, w, mv)
    table = jax.jit(mk)(key)
  else:
    table = jax.jit(lambda k: jnp.abs(jax.random.normal(
        k, (meta.phys_rows, meta.width), jnp.float32)) * 0.01)(key)

  ref = None  # host copy of 4096 sampled rows only (full copies OOM HBM)
  idx = jnp.asarray(np.random.RandomState(0).randint(0, meta.phys_rows, 4096))
  state = None
  for pipe, mb in [(0, 12), (1, 12), (1, 16), (1, 8), (1, 24), (1, 4)]:
    os.environ['EASYREC_PACKED_PIPELINE'] = str(pipe)
    os.environ['EASYREC_PACKED_CHUNK_MB'] = str(mb)

    math_fn = opt.compact_math if getattr(meta, 'compact', False) \
        else opt.block_math

    def kern(state, ugids, gg):
      return (pt._rmw_pallas(state[0], ugids, gg, opt.hypers(lr, st),
                             math_fn, meta),)
    fn = jax.jit(kern, donate_argnums=(0,))
    try:
      state = (table + 0,)
      for _ in range(3):
        state = fn(state, ugids, gg)
      sync(state)
      got = np.asarray(jnp.take(state[0], idx, axis=0))
      if ref is None:
        ref = got
        # Name the baseline config: if the intended first config failed
        # to compile, the maxdiffs below are vs a different variant.
        dmsg = f'(reference = pipe={pipe} chunk_mb={mb})'
      else:
        d = float(np.max(np.abs(got - ref)))
        dmsg = f'(sampled maxdiff {d:.1e})'
      state = None
      state = (table + 0,)
      for _ in range(3):
        state = fn(state, ugids, gg)
      sync(state)
      t0 = time.perf_counter()
      for _ in range(10):
        state = fn(state, ugids, gg)
      sync(state)
      tk = (time.perf_counter() - t0) / 10
      print(f'[{tag}] RMW pipe={pipe} chunk_mb={mb:2d}: {tk*1e3:8.2f} ms '
            f'{dmsg}', flush=True)
    except Exception as e:
      print(f'[{tag}] RMW pipe={pipe} chunk_mb={mb:2d}: FAILED '
            f'{type(e).__name__}: {str(e)[:120]}', flush=True)
    finally:
      state = None
      fn.clear_cache()
  os.environ.pop('EASYREC_PACKED_PIPELINE', None)
  os.environ.pop('EASYREC_PACKED_CHUNK_MB', None)


def e2e_sweep(meta, n_ids, tag):
  """End-to-end apply_packed_update (prep + RMW): fused vs split."""
  key = jax.random.PRNGKey(0)
  ids = jax.random.randint(key, (n_ids,), 0, meta.rows, jnp.int32)
  grads = jax.random.normal(key, (n_ids, meta.dim), jnp.float32)
  opt = sparse_lib.sparse_adam()
  lr, st = jnp.float32(1e-3), jnp.int32(5)
  # abs(): the packed layout interleaves Adam v-slots into this array;
  # negative v would make sqrt(v) NaN and poison the parity check.
  # compact metas pack v as the LOW bf16 of each pair lane — raw random
  # f32 bits decode to negative v, so build those lanes via pack_pair.
  if getattr(meta, 'compact', False):
    def mk(k):
      w = jnp.abs(jax.random.normal(
          k, (meta.phys_rows, meta.width), jnp.float32)) * 0.01
      col = jax.lax.broadcasted_iota(
          jnp.int32, (meta.phys_rows, meta.width), 1)
      mv = sparse_lib.pack_pair(w * 0.1, w)      # m small, v >= 0
      return jnp.where((col % meta.cc) < meta.dim, w, mv)
    table = jax.jit(mk)(key)
  else:
    table = jax.jit(lambda k: jnp.abs(jax.random.normal(
        k, (meta.phys_rows, meta.width), jnp.float32)) * 0.01)(key)

  ref = None  # host copy of 4096 sampled rows only (full copies OOM HBM)
  idx = jnp.asarray(np.random.RandomState(0).randint(0, meta.phys_rows, 4096))
  state = None
  for fused, pipe, mb in [(0, 0, 12), (0, 1, 12), (1, 0, 12),
                          (1, 1, 12), (1, 1, 8), (1, 1, 16)]:
    os.environ['EASYREC_PACKED_FUSED'] = str(fused)
    os.environ['EASYREC_PACKED_PIPELINE'] = str(pipe)
    os.environ['EASYREC_PACKED_CHUNK_MB'] = str(mb)

    math_fn = opt.compact_math if getattr(meta, 'compact', False) \
        else opt.block_math

    def kern(state, ids, grads):
      return (pt.apply_packed_update(state[0], ids, grads,
                                     opt.hypers(lr, st), math_fn,
                                     meta, use_pallas=True),)
    fn = jax.jit(kern, donate_argnums=(0,))
    try:
      state = (table + 0,)
      for _ in range(3):
        state = fn(state, ids, grads)
      sync(state)
      got = np.asarray(jnp.take(state[0], idx, axis=0))
      if ref is None:
        ref = got
        # Name the baseline config (see rmw_sweep note).
        dmsg = f'(reference = fused={fused} pipe={pipe} chunk_mb={mb})'
      else:
        d = float(np.max(np.abs(got - ref)))
        dmsg = f'(sampled maxdiff {d:.1e})'
      state = None
      state = (table + 0,)
      for _ in range(3):
        state = fn(state, ids, grads)
      sync(state)
      t0 = time.perf_counter()
      for _ in range(10):
        state = fn(state, ids, grads)
      sync(state)
      tk = (time.perf_counter() - t0) / 10
      print(f'[{tag}] E2E fused={fused} pipe={pipe} chunk_mb={mb:2d}: '
            f'{tk*1e3:8.2f} ms {dmsg}', flush=True)
    except Exception as e:
      print(f'[{tag}] E2E fused={fused} pipe={pipe} chunk_mb={mb:2d}: '
            f'FAILED {type(e).__name__}: {str(e)[:160]}', flush=True)
    finally:
      state = None
      fn.clear_cache()
  for k in ('EASYREC_PACKED_FUSED', 'EASYREC_PACKED_PIPELINE',
            'EASYREC_PACKED_CHUNK_MB'):
    os.environ.pop(k, None)


def main():
  which = sys.argv[1] if len(sys.argv) > 1 else 'all'
  n_ids = 4096 * 26
  compact = os.environ.get('EASYREC_SWEEP_COMPACT', '0') == '1'
  deep = pt.PackMeta(26_000_000, 16, 3, compact=compact)
  wide = pt.PackMeta(26_000_000, 1, 3, compact=compact)
  print(deep)
  print(wide, flush=True)
  if which in ('deep', 'all'):
    seg_sweep(deep, n_ids, 'deep')
  if which in ('wide', 'all'):
    seg_sweep(wide, n_ids, 'wide')
  if which in ('rmw', 'all'):
    rmw_sweep(deep, n_ids, 'rmw-deep')
    rmw_sweep(wide, n_ids, 'rmw-wide')
  if which in ('e2e', 'all'):
    e2e_sweep(deep, n_ids, 'e2e-deep')
    e2e_sweep(wide, n_ids, 'e2e-wide')


if __name__ == '__main__':
  main()
