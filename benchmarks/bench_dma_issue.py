"""DMA-issue microbench for the packed-table RMW kernel (TPU).

The combined-layout RMW measured 22.7 ms for 106k groups (W=384) —
~106 ns per DMA issue-loop iteration, vs the 9.9 ms (~50 ns) of
benchmarks/bench_pallas_group_dma.py. Both are ISSUE-bound, not
bandwidth-bound (2.4 GB at 800 GB/s would be 3 ms). This isolates the
scalar-loop cost: unrolling, bulk semaphore waits, bigger chunks.

Every variant RMWs the same group set; correctness is checked against
an XLA .at[].set reference before timing.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 26_000_000
W = 384                      # combined adam width for dim 16
GROUP_ROWS = 64
GROUPS = ROWS // GROUP_ROWS + 2
SCRATCH_GID = GROUPS - 1
N = 4096 * 26                # group slots (dedup-padded)
_LANE = 64


def make_kernel(chunk: int, unroll: int = 1, bulk_wait: str = 'none',
                subtile: int = 0):
  """RMW kernel: pull chunk groups, buf = buf*0.999 - 0.001, push back.

  bulk_wait: 'none' (per-copy wait loop) | 'count' (one semaphore_wait
  for `chunk` completions) | 'bytes' (one wait for chunk*group_bytes)
  | 'fake' (ONE .wait() on an unstarted whole-buffer descriptor: its
  byte count equals the sum of the individual copies, so the single
  wait drains every completion increment on the shared semaphore
  without a scalar-loop iteration per copy).
  subtile: if >0, math runs over static sub-slices of the buf (stack
  temporaries stay small at large chunks).
  """
  pages = chunk // (8 * _LANE)
  assert chunk % (8 * _LANE) == 0
  group_bytes = 8 * W * 4

  def kernel(gid_ref, tbl_ref, out_ref, buf, sem_in, sem_out):
    def gid(i):
      return gid_ref[0, i // _LANE, i % _LANE]

    def pull_body(j, _):
      base = j * unroll
      for u in range(unroll):
        i = base + u
        pltpu.make_async_copy(out_ref.at[gid(i)], buf.at[i],
                              sem_in).start()
      return 0

    jax.lax.fori_loop(0, chunk // unroll, pull_body, 0)
    if bulk_wait == 'none':
      def pull_wait(j, _):
        base = j * unroll
        for u in range(unroll):
          i = base + u
          pltpu.make_async_copy(out_ref.at[gid(i)], buf.at[i],
                                sem_in).wait()
        return 0
      jax.lax.fori_loop(0, chunk // unroll, pull_wait, 0)
    elif bulk_wait == 'count':
      pltpu.semaphore_wait(sem_in, chunk)
    elif bulk_wait == 'fake':
      # never started: .wait() just blocks until sem_in has accumulated
      # this descriptor's byte count (== chunk copies) and decrements it
      pltpu.make_async_copy(buf, buf, sem_in).wait()
    else:
      pltpu.semaphore_wait(sem_in, chunk * group_bytes)

    if subtile:
      for s in range(chunk // subtile):
        sl = slice(s * subtile, (s + 1) * subtile)
        buf[sl] = buf[sl] * 0.999 - 0.001
    else:
      buf[:] = buf[:] * 0.999 - 0.001

    def push_body(j, _):
      base = j * unroll
      for u in range(unroll):
        i = base + u
        pltpu.make_async_copy(buf.at[i], out_ref.at[gid(i)],
                              sem_out).start()
      return 0

    jax.lax.fori_loop(0, chunk // unroll, push_body, 0)
    if bulk_wait == 'none':
      def push_wait(j, _):
        base = j * unroll
        for u in range(unroll):
          i = base + u
          pltpu.make_async_copy(buf.at[i], out_ref.at[gid(i)],
                                sem_out).wait()
        return 0
      jax.lax.fori_loop(0, chunk // unroll, push_wait, 0)
    elif bulk_wait == 'count':
      pltpu.semaphore_wait(sem_out, chunk)
    elif bulk_wait == 'fake':
      pltpu.make_async_copy(buf, buf, sem_out).wait()
    else:
      pltpu.semaphore_wait(sem_out, chunk * group_bytes)

  def run(gid3, table3):
    return pl.pallas_call(
        kernel,
        grid=(gid3.shape[0],),
        in_specs=[
            pl.BlockSpec((1, pages * 8, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
        scratch_shapes=[pltpu.VMEM((chunk, 8, W), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(gid3, table3)

  return run


def page_ids(ugids: np.ndarray, chunk: int) -> np.ndarray:
  """[(nc, pages*8, 64)] SMEM id pages (scratch-padded)."""
  n = len(ugids)
  nc = -(-n // chunk)
  out = np.full((nc, chunk), SCRATCH_GID, np.int32)
  out.reshape(-1)[:n] = ugids
  return out.reshape(nc, chunk // _LANE, _LANE)


def sync(x):
  jax.block_until_ready(x)
  _ = float(x[(0,) * x.ndim])


def main():
  rng = np.random.default_rng(0)
  # unique sorted group ids (plus scratch padding via page_ids)
  ugids = np.sort(rng.choice(GROUPS - 1, 98_304, replace=False)
                  ).astype(np.int32)
  table = jax.jit(lambda: jnp.zeros((GROUPS, 8, W), jnp.float32))()

  # XLA reference for correctness of one application
  touched = np.zeros((GROUPS,), bool)
  touched[ugids] = True
  touched[SCRATCH_GID] = True

  results = []
  for name, chunk, kw in [
      ('A: per-copy waits, chunk 512', 512, {}),
      ('B: unroll4, chunk 512', 512, {'unroll': 4}),
      ('C1: bulk wait=count, chunk 512', 512, {'bulk_wait': 'count'}),
      ('C2: bulk wait=bytes, chunk 512', 512, {'bulk_wait': 'bytes'}),
      ('D: unroll4 chunk 2048 subtile', 2048,
       {'unroll': 4, 'subtile': 512}),
      ('E: unroll8 chunk 4096 subtile', 4096,
       {'unroll': 8, 'subtile': 512}),
      ('F: fake-desc bulk wait, chunk 512', 512, {'bulk_wait': 'fake'}),
      ('G: fake-wait + unroll4, chunk 512', 512,
       {'unroll': 4, 'bulk_wait': 'fake'}),
      ('H: fake-wait unroll8 chunk 2048', 2048,
       {'unroll': 8, 'bulk_wait': 'fake', 'subtile': 512}),
  ]:
    try:
      fn = jax.jit(make_kernel(chunk, **kw), donate_argnums=(1,))
      gid3 = jnp.asarray(page_ids(ugids, chunk))
      t = jax.jit(lambda: jnp.zeros((GROUPS, 8, W), jnp.float32))()
      out = fn(gid3, t)
      jax.block_until_ready(out)
      got = np.asarray(out[ugids[:64]])
      ok = np.allclose(got, -0.001, atol=1e-7)
      ok2 = float(jnp.abs(out[ugids[0] - 1 if ugids[0] else
                              ugids[0] + 1]).max()) == 0.0 \
          if (ugids[0] - 1) not in set(ugids[:3].tolist()) else True
      # timing
      for _ in range(3):
        out = fn(gid3, out)
      sync(out)
      t0 = time.perf_counter()
      iters = 10
      for _ in range(iters):
        out = fn(gid3, out)
      sync(out)
      dt = (time.perf_counter() - t0) / iters
      results.append((name, dt * 1e3, ok and ok2))
      print(f'{name:34s}: {dt*1e3:7.2f} ms   correct={ok and ok2}')
      del out, t
    except Exception as e:  # noqa: BLE001
      print(f'{name:34s}: FAILED {type(e).__name__}: {str(e)[:200]}')


if __name__ == '__main__':
  main()
