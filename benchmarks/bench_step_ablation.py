"""In-jit ablation of the flagship train step (TPU).

bench.py measures ~85 ms/step pipelined, but the known stages (fwd/bwd
~3, gathers ~1.4, dedup ~1, scatters ~44) sum to ~50 ms — this isolates
where the rest goes. Each variant runs K steps inside ONE jitted
lax.scan (no per-step dispatch): full step, loss-only (no updates),
dense-only, per-table sparse updates, and the packed path.

Run: python benchmarks/bench_step_ablation.py
"""

from __future__ import annotations

import functools
import time

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.dirname(_os_.path.dirname(_os_.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.train.trainer import Trainer, TrainState
from easyrec_tpu.utils.flagship import criteo_deepfm_config
from easyrec_tpu.utils.synthetic import synthetic_batch
from easyrec_tpu.ops import embedding as emb_ops
from easyrec_tpu.optim import sparse as sparse_lib

K = 20


def build(trainer, update: str):
  """update: 'none' | 'dense' | 'all' | 'deep-only' | 'wide-only'."""
  model, module, layout = trainer.model, trainer.module, trainer.layout
  dense_tx = trainer.dense_opt.dense
  sparse_opt = trainer.embed_opt.sparse
  schedule = trainer.embed_opt.schedule
  mult = trainer.embed_opt.embedding_lr_multiplier
  scratch = {k: layout.scratch_row(k) for k in layout.tables}
  pack_metas = trainer.pack_metas

  def one_step(state, batch):
    packs = emb_ops.pack_all_views(layout, batch)
    pulled = emb_ops.pull_embeddings(state.tables, packs, pack_metas)

    def loss_fn(params, pulled):
      outputs = module.apply({'params': params}, batch, pulled, True,
                             mutable=['batch_stats', 'losses'],
                             rngs={'dropout': jax.random.PRNGKey(0)})[0]
      total, _ = model.build_loss(outputs, batch)
      return total

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))
    loss, (g_params, g_pulled) = grad_fn(state.params, pulled)

    new_params, new_opt = state.params, state.opt_state
    if update in ('dense', 'all', 'deep-only', 'wide-only'):
      import optax
      updates, new_opt = dense_tx.update(g_params, state.opt_state,
                                         state.params)
      new_params = optax.apply_updates(state.params, updates)

    new_tables, new_slots = state.tables, state.slots
    if update == 'deep-prep':
      # packed: group_prep only (sort + lane expansion + segment-sum) —
      # the kernel's input build without the RMW kernel itself.
      # plain: dedup + row gathers + adam math, NO scatters.
      key = [k for k in state.tables if not k.startswith('wide')][0]
      table = state.tables[key]
      ids = packs[key].reshape(-1)
      if pack_metas is not None:
        from easyrec_tpu.ops import packed_table as pt
        g = g_pulled[key].reshape(-1, pack_metas[key].dim)
        ugids, gg = pt.group_prep(ids, g, pack_metas[key])
        loss = loss + 0.0 * (jnp.sum(gg) + jnp.sum(ugids))
      else:
        g = g_pulled[key].reshape(-1, table.shape[-1])
        uids, ug = sparse_lib.dedup_sum(ids, g, layout.scratch_row(key))
        m = jnp.take(state.slots[key]['m'], uids, axis=0) * 0.9 + ug
        v = jnp.take(state.slots[key]['v'], uids, axis=0) * 0.999 + ug**2
        w = jnp.take(table, uids, axis=0)
        upd = w - 0.001 * m / (jnp.sqrt(v) + 1e-8)
        loss = loss + 0.0 * jnp.sum(upd)
    if update in ('deep-prep-sort', 'deep-prep-expand') and \
        pack_metas is not None:
      # finer prep stages IN-STEP: sort+takes only / +lane expansion
      from easyrec_tpu.ops import packed_table as pt
      key = [k for k in state.tables if not k.startswith('wide')][0]
      meta = pack_metas[key]
      ids = packs[key].reshape(-1)
      g = g_pulled[key].reshape(-1, meta.dim)
      order = jnp.argsort(ids)
      sids = jnp.take(ids, order)
      sgrads = jnp.take(g, order, axis=0).astype(jnp.float32)
      if update == 'deep-prep-expand':
        within = sids % meta.group_rows
        lane = within % meta.pack
        expanded = pt._expand_lanes(sgrads, lane, meta)
        loss = loss + 0.0 * jnp.sum(expanded)
      else:
        loss = loss + 0.0 * (jnp.sum(sgrads) + jnp.sum(sids))
    if update in ('deep-prep-bf16', 'deep-prep-bf16mix') and \
        pack_metas is not None:
      # segsum byte-width A/B: expanded+gg in bf16 (traffic halves) vs
      # bf16 payload with f32 accumulation-by-XLA (dtype of segment_sum
      # output follows input)
      from easyrec_tpu.ops import packed_table as pt
      key = [k for k in state.tables if not k.startswith('wide')][0]
      meta = pack_metas[key]
      ids = packs[key].reshape(-1)
      g = g_pulled[key].reshape(-1, meta.dim)
      order = jnp.argsort(ids)
      sids = jnp.take(ids, order)
      sgrads = jnp.take(g, order, axis=0).astype(jnp.float32)
      within = sids % meta.group_rows
      lane = within % meta.pack
      expanded = pt._expand_lanes(sgrads, lane, meta)
      gids = sids // meta.group_rows
      sub = within // meta.pack
      first = jnp.concatenate([jnp.ones((1,), bool),
                               gids[1:] != gids[:-1]])
      gseg = jnp.cumsum(first) - 1
      flat = gseg * 8 + sub
      _SEG_B = pt._seg_b()
      q = _SEG_B // 8
      cap = min(-(-ids.shape[0] // q) * q, meta.groups)
      if update == 'deep-prep-bf16':
        gg = jax.ops.segment_sum(expanded.astype(jnp.bfloat16), flat,
                                 num_segments=cap * 8,
                                 indices_are_sorted=True)
      else:
        gg = jax.ops.segment_sum(expanded.astype(jnp.bfloat16)
                                 .astype(jnp.float32), flat,
                                 num_segments=cap * 8,
                                 indices_are_sorted=True)
      loss = loss + 0.0 * jnp.sum(gg.astype(jnp.float32))
    if update == 'deep-rawscatter' and pack_metas is None:
      # three raw scatter-adds with NO dedup (scatter cost alone)
      key = [k for k in state.tables if not k.startswith('wide')][0]
      ids = packs[key].reshape(-1)
      g = g_pulled[key].reshape(-1, state.tables[key].shape[-1])
      nt = dict(state.tables)
      ns = dict(state.slots)
      nt[key] = state.tables[key].at[ids].add(-0.001 * g)
      ns[key] = {'m': state.slots[key]['m'].at[ids].add(0.1 * g),
                 'v': state.slots[key]['v'].at[ids].add(g * g)}
      new_tables, new_slots = nt, ns
    if update in ('all', 'deep-only', 'wide-only'):
      lr = schedule(state.step) * mult
      keys = list(state.tables)
      if update == 'deep-only':
        keys = [k for k in keys if not k.startswith('wide')]
      elif update == 'wide-only':
        keys = [k for k in keys if k.startswith('wide')]
      sub_t = {k: state.tables[k] for k in keys}
      sub_s = {k: state.slots[k] for k in keys}
      if pack_metas is not None:
        nt = sparse_lib.apply_sparse_updates_packed(
            sub_t, packs, g_pulled, sparse_opt, lr, state.step,
            pack_metas, use_pallas=trainer._packed_pallas)
        ns = sub_s
      else:
        nt, ns = sparse_lib.apply_sparse_updates(
            sub_t, sub_s, packs, g_pulled, sparse_opt, lr, state.step,
            scratch)
      new_tables = dict(state.tables, **nt)
      new_slots = dict(state.slots, **ns)

    return TrainState(step=state.step + 1, params=new_params,
                      batch_stats=state.batch_stats, opt_state=new_opt,
                      tables=new_tables, slots=new_slots), loss

  return jax.jit(one_step, donate_argnums=(0,))


def timeit(fn, state, batch, iters=30):
  """Pipelined per-dispatch timing with an honest end-of-window fetch
  (block_until_ready alone lies through the axon tunnel — PERF.md)."""
  for _ in range(8):
    state, loss = fn(state, batch)
  jax.block_until_ready((state, loss))
  _ = float(loss)
  t0 = time.perf_counter()
  for _ in range(iters):
    state, loss = fn(state, batch)
  jax.block_until_ready((state, loss))
  _ = float(loss)
  return (time.perf_counter() - t0) / iters, state


def main():
  import os
  from easyrec_tpu.utils import flagship
  bs = int(os.environ.get('BENCH_BATCH_SIZE', 4096))
  model = os.environ.get('BENCH_MODEL', 'deepfm')
  seq_len = int(os.environ.get('BENCH_SEQ_LEN', 50))
  if model == 'deepfm':
    cfg = criteo_deepfm_config(
        batch_size=bs,
        hash_bucket_size=int(os.environ.get('BENCH_HASH_BUCKETS', 1000000)))
    labels = ['label']
  else:
    cfg = getattr(flagship, 'taobao_%s_config' % model)(
        batch_size=bs, seq_len=seq_len)
    labels = ['clk', 'buy'] if model == 'mmoe' else ['clk']
  trainer = Trainer(cfg)
  print('model =', model, 'packed_mode =', trainer.packed_mode,
        'batch =', bs)
  batch = synthetic_batch(trainer.specs, labels, bs, seed=0)
  sharded = trainer.rules.shard_batch(batch)
  state = trainer.init_state(batch)

  import sys
  variants = sys.argv[1:] or ['none', 'dense', 'deep-prep',
                              'deep-rawscatter', 'wide-only', 'deep-only',
                              'all']
  for variant in variants:
    fn = build(trainer, variant)
    t, state = timeit(fn, state, sharded)
    print(f'{variant:16s}: {t*1e3:8.2f} ms/step  '
          f'({bs/t:,.0f} ex/s)')


if __name__ == '__main__':
  main()
