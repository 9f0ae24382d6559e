"""Stage-by-stage profile of the packed-v2 update path (TPU).

bench_packed_v2.py measured the full packed Adam update at ~446 ms vs the
validated standalone kernel's 9.9 ms; this isolates which stage penalizes:
dedup, group prep, group gathers, math, or the Pallas push (and push
variants: chunk size, combined RMW-in-kernel).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.optim import sparse as sparse_lib
from benchmarks.bench_packed_v2 import (PackMeta, group_prep, take_groups,
                                        push_groups_pallas)


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


def t_threaded(fn, state, args, iters=10):
  """Returns (secs, final_state) — state is donated, use the returned one."""
  for _ in range(3):
    state = fn(state, *args)
  sync(state)
  t0 = time.perf_counter()
  for _ in range(iters):
    state = fn(state, *args)
  sync(state)
  return (time.perf_counter() - t0) / iters, state


def push_variant(packed3, ugids, new_rows, meta, chunk):
  """Push-only kernel, parametrized chunk (groups per grid step)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  _LANE = 64
  n = ugids.shape[0]
  assert n % chunk == 0
  gid2 = ugids.astype(jnp.int32).reshape(n // _LANE, _LANE)

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
      grid=(n // chunk,),
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
  return fn(gid2, new_rows, packed3)


def rmw_variant(packed3, ugids, gg, meta, chunk):
  """Validated-style kernel: pull groups, math in VMEM, push back."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  _LANE = 64
  n = ugids.shape[0]
  assert n % chunk == 0
  gid2 = ugids.astype(jnp.int32).reshape(n // _LANE, _LANE)

  def kernel(gid_ref, gg_ref, tbl_ref, out_ref, buf, sem_in, sem_out):
    def pull(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(out_ref.at[rid], buf.at[i], sem_in).start()
      return 0

    def pull_wait(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(out_ref.at[rid], buf.at[i], sem_in).wait()
      return 0

    jax.lax.fori_loop(0, chunk, pull, 0)
    jax.lax.fori_loop(0, chunk, pull_wait, 0)
    buf[:] = buf[:] * 0.999 - 0.001 * gg_ref[:]

    def push(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(buf.at[i], out_ref.at[rid], sem_out).start()
      return 0

    def push_wait(i, _):
      rid = gid_ref[i // _LANE, i % _LANE]
      pltpu.make_async_copy(buf.at[i], out_ref.at[rid], sem_out).wait()
      return 0

    jax.lax.fori_loop(0, chunk, push, 0)
    jax.lax.fori_loop(0, chunk, push_wait, 0)

  fn = pl.pallas_call(
      kernel,
      grid=(n // chunk,),
      in_specs=[
          pl.BlockSpec((chunk // _LANE, _LANE), lambda i: (i, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((chunk, 8, meta.width), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),
      ],
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct(packed3.shape, packed3.dtype),
      scratch_shapes=[pltpu.VMEM((chunk, 8, meta.width), jnp.float32),
                      pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
      input_output_aliases={2: 0},
      compiler_params=pltpu.CompilerParams(has_side_effects=True),
  )
  return fn(gid2, gg, packed3)


def main():
  rows = 26_000_000
  n_ids = 4096 * 26
  key = jax.random.PRNGKey(0)
  meta = PackMeta(rows, 16)
  ids = jax.random.randint(key, (n_ids,), 0, rows, jnp.int32)
  grads = jax.random.normal(key, (n_ids, 16), jnp.float32)

  # -- micro stages: where does dedup/prep time go? -------------------
  t = t_simple(jax.jit(lambda i: jnp.argsort(i)), ids)
  print(f'argsort 106k         : {t*1e3:8.2f} ms')
  order = jnp.argsort(ids)

  def sort_take(ids, grads, order):
    return jnp.take(ids, order), jnp.take(grads, order, axis=0)
  t = t_simple(jax.jit(sort_take), ids, grads, order)
  print(f'2x take by order     : {t*1e3:8.2f} ms')
  sids, sgrads = sort_take(ids, grads, order)

  def seg_ids(sids):
    first = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    return jnp.cumsum(first) - 1
  seg = jax.jit(seg_ids)(sids)

  n = ids.shape[0]
  t = t_simple(jax.jit(lambda s, g: jax.ops.segment_sum(
      g, s, num_segments=n)), seg, sgrads)
  print(f'segsum [106k,16]     : {t*1e3:8.2f} ms')
  t = t_simple(jax.jit(lambda s, g: jax.ops.segment_sum(
      g, s, num_segments=n, indices_are_sorted=True)), seg, sgrads)
  print(f'segsum sorted        : {t*1e3:8.2f} ms')
  t = t_simple(jax.jit(lambda s, v: jnp.full(
      (n,), 0, jnp.int32).at[s].set(v)), seg, sids)
  print(f'1-D scatter set      : {t*1e3:8.2f} ms')
  t = t_simple(jax.jit(
      lambda s, v: jnp.full((n,), 0, jnp.int32).at[s].set(
          v, indices_are_sorted=True, unique_indices=False)), seg, sids)
  print(f'1-D scatter sorted   : {t*1e3:8.2f} ms')

  s1 = jax.jit(functools.partial(sparse_lib.dedup_sum,
                                 scratch_row=meta.scratch))
  t = t_simple(s1, ids, grads)
  print(f'dedup_sum            : {t*1e3:8.2f} ms')
  uids, ug = s1(ids, grads)

  s2 = jax.jit(functools.partial(group_prep, meta=meta))
  t = t_simple(s2, uids, ug)
  print(f'group_prep           : {t*1e3:8.2f} ms')
  ugids, gg, touched = s2(uids, ug)

  packed = jax.jit(lambda k: (jax.random.normal(
      k, (meta.groups * 8, meta.width), jnp.float32) * 0.01))(key)

  s3 = jax.jit(functools.partial(take_groups, meta=meta))
  t = t_simple(s3, packed, ugids)
  print(f'take_groups (x1)     : {t*1e3:8.2f} ms')
  gw = s3(packed, ugids)

  def math_only(gw, gg, touched):
    nm = 0.9 * gw + 0.1 * gg
    nw = jnp.where(touched, gw - 0.001 * nm, gw)
    return nw
  s4 = jax.jit(math_only)
  t = t_simple(s4, gw, gg, touched)
  print(f'math (x1)            : {t*1e3:8.2f} ms')
  new_rows = s4(gw, gg, touched).reshape(-1, 8, meta.width)

  packed3 = packed.reshape(meta.groups, 8, meta.width)
  del packed

  for chunk in (512,):
    fn = jax.jit(functools.partial(push_variant, meta=meta, chunk=chunk),
                 donate_argnums=(0,))
    t, packed3 = t_threaded(fn, packed3, (ugids, new_rows), iters=10)
    print(f'push only chunk={chunk:4d} : {t*1e3:8.2f} ms')

  for chunk in (512,):
    fn = jax.jit(functools.partial(rmw_variant, meta=meta, chunk=chunk),
                 donate_argnums=(0,))
    t, packed3 = t_threaded(fn, packed3,
                            (ugids, gg.reshape(-1, 8, meta.width)),
                            iters=10)
    print(f'RMW in-kernel chunk={chunk:4d} : {t*1e3:8.2f} ms')

  del gw, new_rows, packed3

  # Production-path timings for the CURRENT combined-layout API live in
  # benchmarks/bench_prep_kernel.py (this file's earlier 'production'
  # section targeted the retired separate-array API).


if __name__ == '__main__':
  main()
