"""Isolated timing of the packed-v3 deep-table update pieces (TPU):
group_prep (sort + expand + segment-sum) vs the Mosaic RMW kernel."""

import functools
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


def main():
  rows, dim, n_ids = 26_000_000, 16, 4096 * 26
  meta = pt.PackMeta(rows, dim, 3)
  print(meta)
  key = jax.random.PRNGKey(0)
  ids = jax.random.randint(key, (n_ids,), 0, rows, jnp.int32)
  grads = jax.random.normal(key, (n_ids, dim), jnp.float32)
  opt = sparse_lib.sparse_adam()
  lr, st = jnp.float32(1e-3), jnp.int32(5)

  prep = jax.jit(functools.partial(pt.group_prep, meta=meta))
  t = t_simple(prep, ids, grads)
  print(f'group_prep XLA-segsum (W={meta.width}) : {t*1e3:8.2f} ms')
  import os
  os.environ['EASYREC_SEG_SUM_KERNEL'] = '1'   # opt-in (slower; PERF.md)
  prep_k = jax.jit(functools.partial(pt.group_prep, meta=meta,
                                     use_pallas=True))
  t = t_simple(prep_k, ids, grads)
  print(f'group_prep Mosaic-segsum      : {t*1e3:8.2f} ms')
  ug2, gg2 = jax.jit(prep_k)(ids, grads)
  ugids, gg = prep(ids, grads)
  import numpy as _np
  d = _np.max(_np.abs(_np.asarray(gg2) - _np.asarray(gg)))
  print(f'  gg max abs diff vs XLA      : {d:.2e}')
  print('gg bytes: %.2f GB' % (gg.size * 4 / 1e9))

  table = jax.jit(lambda k: jax.random.normal(
      k, (meta.phys_rows, meta.width), jnp.float32) * 0.01)(key)

  def kern(state, ugids, gg):
    return (pt._rmw_pallas(state[0], ugids, gg, opt.hypers(lr, st),
                           opt.block_math, meta),)
  fn = jax.jit(kern, donate_argnums=(0,))
  state = (table,)
  for _ in range(3):
    state = fn(state, ugids, gg)
  sync(state)
  t0 = time.perf_counter()
  for _ in range(10):
    state = fn(state, ugids, gg)
  sync(state)
  print(f'RMW kernel (combined)       : '
        f'{(time.perf_counter()-t0)/10*1e3:8.2f} ms')

  # segment-sum payload test: same scatter with compact [N, 128] rows
  seg = jnp.cumsum(jnp.ones((n_ids,), jnp.int32)) - 1
  for wdt in (128, 384):
    x = jnp.ones((n_ids, wdt), jnp.float32)
    f = jax.jit(lambda s, v, n=n_ids: jax.ops.segment_sum(
        v, s, num_segments=n * 8, indices_are_sorted=True))
    t = t_simple(f, seg, x)
    print(f'segsum sorted [106k,{wdt:3d}]->852k : {t*1e3:8.2f} ms')


if __name__ == '__main__':
  main()
