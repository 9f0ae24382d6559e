"""Packed combined-table layout (ops/packed_table.py): host pack/unpack
roundtrip, forward-pull parity, packed sparse-update parity vs the plain
row update (XLA fallback + interpret-mode Mosaic kernel), and an
end-to-end packed DeepFM run (EASYREC_PACKED_TABLES=1, CPU fallback)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easyrec_tpu.ops import packed_table as pt
from easyrec_tpu.optim import sparse as sparse_lib


@pytest.mark.parametrize('dim,n_parts', [(1, 3), (4, 2), (16, 3),
                                         (16, 1), (48, 1), (128, 3)])
def test_pack_unpack_roundtrip(dim, n_parts):
  rows = 1000
  meta = pt.PackMeta(rows, dim, n_parts)
  rng = np.random.RandomState(0)
  w = rng.randn(rows, dim).astype(np.float32)
  slots = [rng.randn(rows, dim).astype(np.float32)
           for _ in range(n_parts - 1)]
  packed = pt.pack_host(w, slots, meta)
  assert packed.shape == (meta.phys_rows, meta.width)
  w2, slots2 = pt.unpack_host(packed, meta)
  np.testing.assert_array_equal(w2, w)
  for a, b in zip(slots2, slots):
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('dim,n_parts', [(1, 3), (16, 3), (16, 1)])
def test_pull_parity(dim, n_parts):
  rows = 777
  meta = pt.PackMeta(rows, dim, n_parts)
  rng = np.random.RandomState(1)
  table = rng.randn(rows, dim).astype(np.float32)
  slots = [np.full((rows, dim), 9.9, np.float32)] * (n_parts - 1)
  packed = jnp.asarray(pt.pack_host(table, slots, meta))
  ids = jnp.asarray(rng.randint(0, rows, (4, 9)).astype(np.int32))
  out = pt.pull(packed, ids, meta)
  assert out.shape == (4, 9, dim)
  np.testing.assert_array_equal(np.asarray(out), table[np.asarray(ids)])


def _run_both(optimizer, dim=16, rows=500, n_ids=137, steps=3,
              interpret=False, atol=1e-5, compact=False):
  """Plain update_rows vs packed combined apply over a few steps.

  Pins EASYREC_GG_BF16=0: these are NUMERICS instruments for the kernel
  math against the plain f32 path; the default bf16 gradient-sum buffer
  trades exactness for bandwidth and is covered by its own tolerance
  test (test_gg_bf16_close_to_f32) + the packed e2e/learnability AUC
  gates."""
  import os
  old_bf16 = os.environ.get('EASYREC_GG_BF16')
  os.environ['EASYREC_GG_BF16'] = '0'
  try:
    return _run_both_inner(optimizer, dim, rows, n_ids, steps,
                           interpret, atol, compact)
  finally:
    if old_bf16 is None:
      os.environ.pop('EASYREC_GG_BF16', None)
    else:
      os.environ['EASYREC_GG_BF16'] = old_bf16


def _run_both_inner(optimizer, dim, rows, n_ids, steps, interpret, atol,
                    compact):
  n_parts = 1 + len(optimizer.slot_names)
  meta = pt.PackMeta(rows, dim, n_parts, compact=compact)
  rng = np.random.RandomState(2)
  w0 = rng.randn(rows, dim).astype(np.float32) * 0.1

  plain_w = jnp.asarray(w0)
  plain_s = optimizer.init(plain_w)
  slots0 = [np.full((rows, dim), optimizer.slot_init[i], np.float32)
            for i in range(n_parts - 1)]
  packed = jnp.asarray(pt.pack_host(w0, slots0, meta))

  for step in range(steps):
    ids_np = rng.randint(0, rows, n_ids).astype(np.int32)
    ids_np[:20] = ids_np[20:40]          # duplicates
    g_np = rng.randn(n_ids, dim).astype(np.float32)
    ids, grads = jnp.asarray(ids_np), jnp.asarray(g_np)
    lr, st = jnp.float32(0.05), jnp.int32(step)

    uids, ug = sparse_lib.dedup_sum(ids, grads, rows - 1)
    plain_w, plain_s = optimizer.update_rows(plain_w, plain_s, uids, ug,
                                             lr, st)
    math_fn = optimizer.compact_math if compact else optimizer.block_math
    packed = pt.apply_packed_update(
        packed, ids, grads, optimizer.hypers(lr, st),
        math_fn, meta, use_pallas=False,
        interpret=interpret)

  got_w, got_slots = pt.unpack_host(np.asarray(packed), meta, rows)
  np.testing.assert_allclose(got_w[:rows - 1],
                             np.asarray(plain_w)[:rows - 1],
                             rtol=0, atol=atol)
  for name, got in zip(optimizer.slot_names, got_slots):
    np.testing.assert_allclose(got[:rows - 1],
                               np.asarray(plain_s[name])[:rows - 1],
                               rtol=0, atol=atol)


@pytest.mark.parametrize('make_opt', [
    sparse_lib.sparse_sgd,
    sparse_lib.sparse_momentum,
    sparse_lib.sparse_adagrad,
    sparse_lib.sparse_adam,
    sparse_lib.sparse_ftrl,
], ids=['sgd', 'momentum', 'adagrad', 'adam', 'ftrl'])
def test_packed_update_parity_xla(make_opt):
  _run_both(make_opt())


@pytest.mark.parametrize('dim', [1, 16])
def test_packed_update_parity_interpret_kernel(dim, monkeypatch):
  """The Mosaic kernel on its DEFAULT configuration (no env pinning):
  whatever defaults ship in ops/packed_table.py must pass parity.
  Ambient env overrides are removed so the test is deterministic."""
  for k in ('EASYREC_PACKED_PIPELINE', 'EASYREC_PACKED_FUSED',
            'EASYREC_PACKED_CHUNK_MB', 'EASYREC_PACKED_UNROLL'):
    monkeypatch.delenv(k, raising=False)
  _run_both(sparse_lib.sparse_adam(), dim=dim, steps=2, interpret=True)


@pytest.mark.parametrize('dim', [1, 16])
def test_packed_update_parity_interpret_pipelined(dim, monkeypatch):
  """The software-pipelined RMW variant (double-slotted group buffer)."""
  monkeypatch.setenv('EASYREC_PACKED_PIPELINE', '1')
  _run_both(sparse_lib.sparse_adam(), dim=dim, steps=2, interpret=True)


@pytest.mark.parametrize('dim', [1, 16])
def test_packed_update_parity_interpret_unpipelined(dim, monkeypatch):
  """Pipelining is on by default; keep the single-slot variant covered."""
  monkeypatch.setenv('EASYREC_PACKED_PIPELINE', '0')
  _run_both(sparse_lib.sparse_adam(), dim=dim, steps=2, interpret=True)


@pytest.mark.parametrize('dim', [1, 16])
def test_packed_update_parity_interpret_fused(dim, monkeypatch):
  """The fused RMW variant (in-kernel segmented gradient sum)."""
  monkeypatch.setenv('EASYREC_PACKED_FUSED', '1')
  _run_both(sparse_lib.sparse_adam(), dim=dim, steps=2, interpret=True)
  # FTRL squares gradients: the in-kernel bf16 hi/lo-split segment-sum
  # error (~2^-16 relative) amplifies to ~1e-4 absolute.
  _run_both(sparse_lib.sparse_ftrl(), dim=dim, steps=2, interpret=True,
            atol=3e-4)


def test_group_prep_truncates_small_tables():
  """cap = min(n_ids, groups): the wide [rows, 1] table sees far fewer
  groups than id slots."""
  meta = pt.PackMeta(4096, 1, 3)        # group_rows large for dim 1
  ids = jnp.asarray(np.random.RandomState(0).randint(0, 4096, 10000)
                    .astype(np.int32))
  grads = jnp.ones((10000, 1), jnp.float32)
  ugids, gg = pt.group_prep(ids, grads, meta)
  assert ugids.shape[0] == min(10000, meta.groups)
  assert gg.shape == (ugids.shape[0], 8, meta.part_width)


@pytest.mark.parametrize('n,pw,cap8', [(1000, 128, 1024), (64, 128, 512),
                                       (3000, 384, 4096)])
def test_seg_sum_kernel_parity(n, pw, cap8):
  """The Mosaic segmented-sum (scatter-free gg build) vs
  jax.ops.segment_sum, including empty blocks and duplicate slots."""
  rng = np.random.RandomState(0)
  flat = np.sort(rng.randint(0, cap8, n)).astype(np.int32)
  exp = rng.randn(n, pw).astype(np.float32)
  ref = jax.ops.segment_sum(jnp.asarray(exp), jnp.asarray(flat),
                            num_segments=cap8, indices_are_sorted=True)
  got = pt._seg_sum_pallas(jnp.asarray(exp), jnp.asarray(flat), cap8,
                           interpret=True)
  # bf16 hi/lo gradient split: ~2^-17 relative
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=0, atol=2e-4)


def test_wide_dim_gating():
  assert pt.supported(16, 3) and pt.supported(1, 3) \
      and pt.supported(128, 3) and pt.supported(48, 1)
  assert not pt.supported(48, 3)        # lcm(144,128)=1152 > MAX_WIDTH
  assert not pt.supported(129, 1)


def test_packed_trainer_end_to_end(tmp_path, monkeypatch):
  """DeepFM trains in packed mode (XLA fallback on CPU) and learns;
  export carries LOGICAL weights; predict parity via the Predictor."""
  monkeypatch.setenv('EASYREC_PACKED_TABLES', '1')
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.train.trainer import Trainer
  from tests import fixtures
  cfg_path = fixtures.write_pipeline(tmp_path, num_steps=120)
  cfg = get_configs_from_pipeline_file(cfg_path)
  trainer = Trainer(cfg)
  assert trainer.packed_mode, 'packed mode should engage when forced'
  result = trainer.fit()
  auc = result['eval_metrics']['auc']
  assert auc > 0.75, 'packed DeepFM failed to learn: auc=%s' % auc

  # export writes logical [rows, dim] weights
  from easyrec_tpu.export.saved_model import (export_saved_model,
                                              load_serving_state)
  export_dir = export_saved_model(trainer, result['state'],
                                  str(tmp_path / 'export'))
  _, serving = load_serving_state(export_dir)
  for key, t in trainer.layout.tables.items():
    assert serving['tables'][key].shape[1] == t.dim

  # serving parity through the Predictor
  from easyrec_tpu.export.predictor import Predictor
  pred = Predictor(export_dir)
  n = pred.predict_csv(str(tmp_path / 'eval.csv'),
                       str(tmp_path / 'pred_out.csv'))
  assert n == 1024
  import csv
  with open(tmp_path / 'pred_out.csv') as f:
    rows = list(csv.DictReader(f))
  probs = np.asarray([float(r['probs']) for r in rows], np.float64)
  assert len(probs) == 1024 and np.all((probs >= 0) & (probs <= 1))


def test_packed_dssm_with_negatives(tmp_path, monkeypatch):
  """Sampled-negative views ('neg.feat.*') flow through the packed pull
  and the packed sparse update (their gradients update the tables)."""
  monkeypatch.setenv('EASYREC_PACKED_TABLES', '1')
  from tests.test_samplers import _setup, NEG_SAMPLER
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.train.trainer import Trainer
  cfg = get_configs_from_pipeline_file(_setup(tmp_path, NEG_SAMPLER))
  trainer = Trainer(cfg)
  assert trainer.packed_mode
  result = trainer.fit(checkpoint=False)
  hist = result['history']
  assert hist[-1]['loss'] < hist[0]['loss']
  assert result['eval_metrics']['recall@5'] > 0.55, result['eval_metrics']


def test_pack_meta_non_power_of_two_shards():
  """groups stays divisible by non-power-of-two shard counts (lcm
  quantum; code-review regression), and power-of-two geometry is
  unchanged (checkpoint compatibility)."""
  from easyrec_tpu.ops.packed_table import PackMeta
  m6 = PackMeta(100_000, 16, 3, shards=6)
  assert m6.groups % 6 == 0
  lv = m6.local_view()
  assert lv.groups * 6 == m6.groups
  # power-of-two shard counts keep the fixed 256 quantum
  m1 = PackMeta(100_000, 16, 3, shards=1)
  m8 = PackMeta(100_000, 16, 3, shards=8)
  assert m1.groups == m8.groups
  assert m1.groups % 256 == 0


def test_packed_mode_respects_replicated_tables(monkeypatch, tmp_path):
  """Mirrored (replicated-tables) strategies must not pick the packed
  multi-device path, which would silently row-shard the tables
  (code-review regression)."""
  monkeypatch.setenv('EASYREC_PACKED_TABLES', '1')
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.train.trainer import Trainer
  from tests import fixtures
  cfg = get_configs_from_pipeline_file(
      fixtures.write_pipeline(tmp_path, num_steps=1))
  from easyrec_tpu.protos import train_pb2
  cfg.train_config.train_distribute = \
      train_pb2.DistributionStrategy.Value('MirroredStrategy')
  trainer = Trainer(cfg)
  assert not trainer.rules.shard_embeddings
  assert not trainer.packed_mode


# ---------------------------------------------------- sharded exchange

def _run_sharded(mode, interpret, steps=2, rows=4096, dim=16, n_ids=600,
                 atol=1e-5):
  """_packed_update_sharded on the 8-device mesh vs the plain
  single-device row update. Covers the owner-partitioned a2a exchange
  (emulated collective on CPU), the all-gather fallback, and — with
  interpret=True — the shard_map x Mosaic-interpret combination that
  executes on a real pod (VERDICT r1 weak #5)."""
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  optimizer = sparse_lib.sparse_adam()
  n_parts = 1 + len(optimizer.slot_names)
  meta = pt.PackMeta(rows, dim, n_parts, shards=8)
  mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
              ('data', 'model'))
  rng = np.random.RandomState(7)
  w0 = rng.randn(rows, dim).astype(np.float32) * 0.1
  slots0 = [np.full((rows, dim), optimizer.slot_init[i], np.float32)
            for i in range(n_parts - 1)]
  packed = jax.device_put(
      pt.pack_host(w0, slots0, meta),
      NamedSharding(mesh, P(('data', 'model'), None)))
  plain_w = jnp.asarray(w0)
  plain_s = optimizer.init(plain_w)

  import os
  old = os.environ.get('EASYREC_PACKED_EXCHANGE')
  old_bf16 = os.environ.get('EASYREC_GG_BF16')
  os.environ['EASYREC_PACKED_EXCHANGE'] = mode
  os.environ['EASYREC_GG_BF16'] = '0'   # numerics instrument (see _run_both)

  # jit once: a bare _packed_update_sharded call re-traces its shard_map
  # body EVERY step (trace+lower of the emulated exchange dominated the
  # suite profile at 263 s for this test); the wrapper makes step 2+
  # reuse the compiled program
  import jax as _jax

  @_jax.jit
  def _upd(table, ids, grads, hyp):
    return sparse_lib._packed_update_sharded(
        mesh, table, ids, grads, hyp, optimizer.block_math, meta,
        use_pallas=interpret, interpret=interpret)

  try:
    for step in range(steps):
      ids_np = rng.randint(0, rows, n_ids).astype(np.int32)
      ids_np[:30] = ids_np[30:60]          # cross-device duplicates
      g_np = rng.randn(n_ids, dim).astype(np.float32)
      ids, grads = jnp.asarray(ids_np), jnp.asarray(g_np)
      lr, st = jnp.float32(0.05), jnp.int32(step)

      uids, ug = sparse_lib.dedup_sum(ids, grads, rows - 1)
      plain_w, plain_s = optimizer.update_rows(plain_w, plain_s, uids,
                                               ug, lr, st)
      packed, overflow = _upd(packed, ids, grads,
                              optimizer.hypers(lr, st))
      assert int(np.asarray(overflow)) == 0
  finally:
    if old is None:
      os.environ.pop('EASYREC_PACKED_EXCHANGE', None)
    else:
      os.environ['EASYREC_PACKED_EXCHANGE'] = old
    if old_bf16 is None:
      os.environ.pop('EASYREC_GG_BF16', None)
    else:
      os.environ['EASYREC_GG_BF16'] = old_bf16

  got_w, got_slots = pt.unpack_host(np.asarray(packed), meta, rows)
  np.testing.assert_allclose(got_w[:rows - 1],
                             np.asarray(plain_w)[:rows - 1],
                             rtol=0, atol=atol)
  for name, got in zip(optimizer.slot_names, got_slots):
    np.testing.assert_allclose(got[:rows - 1],
                               np.asarray(plain_s[name])[:rows - 1],
                               rtol=0, atol=atol)


@pytest.mark.parametrize('mode', ['a2a_emulated', 'allgather'])
def test_packed_update_sharded_parity_xla(mode):
  _run_sharded(mode, interpret=False)


@pytest.mark.parametrize('mode', ['a2a_emulated', 'allgather'])
def test_packed_update_sharded_parity_interpret_mosaic(mode):
  """shard_map wrapping the INTERPRET-mode Mosaic kernel on the 8-device
  mesh — the combination that actually executes on a real pod."""
  _run_sharded(mode, interpret=True, steps=1, rows=2048, n_ids=300)


def test_capacity_rows_weak_scaling():
  """Owner-side exchange buffers must NOT grow with world size (VERDICT
  r2 weak #1: cap = n_loc * n_dev was ~1.7 GB/device at 256 chips)."""
  from easyrec_tpu.parallel import exchange as ex
  assert ex.capacity_rows(1000, 8) == ex.capacity_rows(1000, 256)
  assert ex.capacity_rows(1000, 256) <= 2 * 1000 + 8
  # never exceeds the true worst case (tiny meshes stay exact)
  assert ex.capacity_rows(100, 2) == 200


def test_exchange_overflow_counted_and_bounded():
  """Force owner-0 hot-spotting (every id in shard 0's row range): the
  capacity clamp must DROP the excess, COUNT it exactly, and leave
  non-received rows untouched; factor=0 restores unbounded parity."""
  import os

  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  optimizer = sparse_lib.sparse_adam()
  rows, dim, n_ids = 4096, 16, 512
  meta = pt.PackMeta(rows, dim, 3, shards=8)
  local_rows = meta.local_view().groups * meta.group_rows
  mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
              ('data', 'model'))
  rng = np.random.RandomState(3)
  w0 = rng.randn(rows, dim).astype(np.float32) * 0.1
  slots0 = [np.zeros((rows, dim), np.float32)] * 2
  packed0 = pt.pack_host(w0, slots0, meta)
  # every id in owner 0's range -> all 8 devices route to one owner;
  # globally UNIQUE so each row is either fully applied or fully
  # dropped (a cross-device duplicate could be partially received)
  ids_np = rng.choice(min(local_rows, rows), size=n_ids,
                      replace=False).astype(np.int32)
  g_np = rng.randn(n_ids, dim).astype(np.float32)
  hyp = optimizer.hypers(jnp.float32(0.05), jnp.int32(0))

  old = os.environ.get('EASYREC_PACKED_EXCHANGE')
  os.environ['EASYREC_PACKED_EXCHANGE'] = 'a2a_emulated'
  try:
    n_loc = n_ids // 8
    live = -(-rows // local_rows)    # shards holding real rows
    # tight factor so the single live owner overflows its buffer
    os.environ['EASYREC_EXCHANGE_CAP_FACTOR'] = '0.25'
    from easyrec_tpu.parallel.exchange import capacity_rows
    cap = capacity_rows(n_loc, 8, live)
    table = jax.device_put(
        packed0, NamedSharding(mesh, P(('data', 'model'), None)))
    new, overflow = sparse_lib._packed_update_sharded(
        mesh, table, jnp.asarray(ids_np), jnp.asarray(g_np), hyp,
        optimizer.block_math, meta, use_pallas=False, interpret=False)
    sent = sum(len(np.unique(ids_np[d * n_loc:(d + 1) * n_loc]))
               for d in range(8))
    assert int(np.asarray(overflow)) == max(0, sent - cap) > 0
    # rows past capacity were dropped, not corrupted: every row either
    # matches the plain update or is untouched
    got_w, _ = pt.unpack_host(np.asarray(new), meta, rows)
    uids, ug = sparse_lib.dedup_sum(jnp.asarray(ids_np),
                                    jnp.asarray(g_np), rows - 1)
    plain_w, _ = optimizer.update_rows(
        jnp.asarray(w0), optimizer.init(jnp.asarray(w0)), uids, ug,
        jnp.float32(0.05), jnp.int32(0))
    plain_w = np.asarray(plain_w)
    touched = np.unique(ids_np)
    updated = dropped = 0
    for r in touched:
      if np.allclose(got_w[r], plain_w[r], atol=1e-5):
        updated += 1
      elif np.array_equal(got_w[r], w0[r]):
        dropped += 1
      else:
        raise AssertionError('row %d neither updated nor untouched' % r)
    assert dropped > 0 and updated > 0

    # unbounded factor restores exact parity
    os.environ['EASYREC_EXCHANGE_CAP_FACTOR'] = '0'
    table = jax.device_put(
        packed0, NamedSharding(mesh, P(('data', 'model'), None)))
    new2, overflow2 = sparse_lib._packed_update_sharded(
        mesh, table, jnp.asarray(ids_np), jnp.asarray(g_np), hyp,
        optimizer.block_math, meta, use_pallas=False, interpret=False)
    assert int(np.asarray(overflow2)) == 0
    got2, _ = pt.unpack_host(np.asarray(new2), meta, rows)
    np.testing.assert_allclose(got2[touched], plain_w[touched],
                               rtol=0, atol=1e-5)
  finally:
    os.environ.pop('EASYREC_EXCHANGE_CAP_FACTOR', None)
    if old is None:
      os.environ.pop('EASYREC_PACKED_EXCHANGE', None)
    else:
      os.environ['EASYREC_PACKED_EXCHANGE'] = old


def test_ep_pull_overflow_returns_zeros_and_counts():
  """Forward-pull capacity drops: dropped ids pull ZERO vectors (never
  garbage) and the stats counter reports them."""
  import os

  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  from easyrec_tpu.ops import embedding as emb_ops

  mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
              ('data', 'model'))
  rows, dim, B, K = 4096, 8, 64, 8
  local_rows = rows // 8
  rng = np.random.RandomState(11)
  w = (np.abs(rng.randn(rows, dim)) + 0.1).astype(np.float32)
  # all ids in owner 0's range
  ids = rng.randint(0, local_rows, (B, K)).astype(np.int32)
  table = jax.device_put(w, NamedSharding(mesh, P(('data', 'model'),
                                                  None)))
  ids_d = jax.device_put(ids, NamedSharding(mesh, P(('data', 'model'))))
  old = os.environ.get('EASYREC_PACKED_EXCHANGE')
  os.environ['EASYREC_PACKED_EXCHANGE'] = 'a2a_emulated'
  try:
    def f(t, i):
      stats = {}
      out = emb_ops.ep_pull_sharded(t, i, mesh, None, stats=stats)
      return out, stats['ep_pull_overflow']
    got, overflow = jax.jit(f)(table, ids_d)
  finally:
    if old is None:
      os.environ.pop('EASYREC_PACKED_EXCHANGE', None)
    else:
      os.environ['EASYREC_PACKED_EXCHANGE'] = old
  got = np.asarray(got)
  assert int(np.asarray(overflow)) > 0
  n_loc = (B // 8) * K
  dropped_pairs = 0
  ok = zero = 0
  for d in range(8):
    sl = slice(d * (B // 8), (d + 1) * (B // 8))
    dropped_ids = set()
    for bi in range(sl.start, sl.stop):
      for ki in range(K):
        if np.array_equal(got[bi, ki], w[ids[bi, ki]]):
          ok += 1
        elif not got[bi, ki].any():
          zero += 1
          dropped_ids.add(int(ids[bi, ki]))
        else:
          raise AssertionError('pull row is neither exact nor zero')
    dropped_pairs += len(dropped_ids)
  assert zero > 0 and ok > 0
  assert dropped_pairs == int(np.asarray(overflow))


def test_sharded_pull_emits_no_table_allgather():
  """Compiled-HLO assertion on the forward pull over a row-sharded packed
  table (VERDICT r1 task 3): XLA's partitioner must gather the (tiny) ids
  and all-reduce the pulled rows — NEVER all-gather table-shaped operands.

  Documents the measured strategy: all-gather s32 ids [N,1] + local
  masked take + all-reduce f32 [N, width]. The [N, width] all-reduce
  carries pack width (incl. optimizer slots), not just dim — the
  motivation for the shard_map EP forward (see ops/embedding.py)."""
  import re
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
              ('data', 'model'))
  meta = pt.PackMeta(65536, 16, 3, shards=8)
  table = jax.device_put(
      np.zeros((meta.phys_rows, meta.width), np.float32),
      NamedSharding(mesh, P(('data', 'model'), None)))
  ids = jax.device_put(
      np.random.RandomState(0).randint(0, 65536, 4096).astype(np.int32),
      NamedSharding(mesh, P(('data', 'model'))))

  txt = jax.jit(
      lambda t, i: pt.pull(t, i, meta)).lower(table, ids).compile() \
      .as_text()
  per_shard_rows = meta.phys_rows // 8
  for line in txt.splitlines():
    # only DEFINITIONS of all-gather ops (uses reference %all-gather too)
    m = re.search(r'=\s*\w+\[(\d+)(?:,(\d+))?[^=]*all-gather\(', line)
    if m is None:
      continue
    elems = int(m.group(1)) * int(m.group(2) or 1)
    # any all-gather must be id-sized (O(N)), never table-shard-sized
    assert elems <= 8 * 4096, (
        'table-sized all-gather in the sharded pull:\n%s' % line)
    assert elems < per_shard_rows * meta.width, line


# ------------------------------------------------------ compact layout

def test_pack_pair_roundtrip():
  """bf16 pair packing: RNE rounding, sign preservation, exactness for
  bf16-representable values (host + jnp implementations agree)."""
  rng = np.random.RandomState(3)
  m = (rng.randn(64, 16) * np.exp(rng.randn(64, 16) * 3)) \
      .astype(np.float32)
  v = np.abs(rng.randn(64, 16)).astype(np.float32)
  mv = pt.np_pack_pair(m, v)
  m2, v2 = pt.np_unpack_pair(mv)
  np.testing.assert_allclose(m2, m, rtol=2 ** -8)
  np.testing.assert_allclose(v2, v, rtol=2 ** -8)
  # bf16-exact values round-trip bit-exactly
  mb = m.astype(jnp.bfloat16).astype(np.float32)
  vb = v.astype(jnp.bfloat16).astype(np.float32)
  m3, v3 = pt.np_unpack_pair(pt.np_pack_pair(mb, vb))
  np.testing.assert_array_equal(m3, mb)
  np.testing.assert_array_equal(v3, vb)
  # jnp kernel-side pack/unpack matches host
  mv_j = np.asarray(sparse_lib.pack_pair(jnp.asarray(m), jnp.asarray(v)))
  np.testing.assert_array_equal(mv_j.view(np.uint32),
                                mv.view(np.uint32))


@pytest.mark.parametrize('dim', [4, 16, 64])
def test_compact_meta_geometry(dim):
  meta = pt.PackMeta(100_000, dim, 3, compact=True)
  assert meta.cc == 2 * dim and meta.n_parts == 2
  full = pt.PackMeta(100_000, dim, 3)
  assert meta.width <= full.width
  if dim == 16:
    assert meta.width == 128 and full.width == 384


def test_compact_pack_unpack_roundtrip():
  meta = pt.PackMeta(1000, 16, 3, compact=True)
  rng = np.random.RandomState(0)
  w = rng.randn(1000, 16).astype(np.float32)
  m = rng.randn(1000, 16).astype(np.float32)
  v = np.abs(rng.randn(1000, 16)).astype(np.float32)
  packed = pt.pack_host(w, [m, v], meta)
  w2, (m2, v2) = pt.unpack_host(packed, meta)
  np.testing.assert_array_equal(w2, w)        # weights stay f32-exact
  np.testing.assert_allclose(m2, m, rtol=2 ** -8)
  np.testing.assert_allclose(v2, v, rtol=2 ** -8)


@pytest.mark.parametrize('dim', [1, 16])
def test_compact_adam_parity_xla(dim):
  """Compact (bf16-moment) packed Adam vs the plain f32 row update: the
  carried moments round to bf16, so tolerance is step-count x rounding
  (~2^-9 relative per step on the update)."""
  _run_both(sparse_lib.sparse_adam(), dim=dim, steps=3, compact=True,
            atol=3e-3)


@pytest.mark.parametrize('dim', [1, 16])
def test_compact_adam_parity_interpret_kernel(dim, monkeypatch):
  for k in ('EASYREC_PACKED_PIPELINE', 'EASYREC_PACKED_FUSED',
            'EASYREC_PACKED_CHUNK_MB', 'EASYREC_PACKED_UNROLL'):
    monkeypatch.delenv(k, raising=False)
  _run_both(sparse_lib.sparse_adam(), dim=dim, steps=2, interpret=True,
            compact=True, atol=3e-3)


@pytest.mark.parametrize('packed', [True, False], ids=['packed', 'plain'])
def test_ep_pull_sharded_parity(packed):
  """EP forward (dedup + owner-routed a2a + local gather + vector
  return, ops/embedding.py ep_pull_sharded) vs a plain take, on the
  8-device mesh with the emulated collective."""
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  from easyrec_tpu.ops import embedding as emb_ops

  mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
              ('data', 'model'))
  rows, dim, B, K = 4096, 16, 64, 9
  rng = np.random.RandomState(5)
  w = rng.randn(rows, dim).astype(np.float32)
  ids = rng.randint(0, rows, (B, K)).astype(np.int32)
  ids[:, 0] = ids[:, 1]                    # duplicates within a row
  if packed:
    meta = pt.PackMeta(rows, dim, 3, shards=8, compact=True)
    slots = [np.zeros((rows, dim), np.float32)] * 2
    table = jax.device_put(pt.pack_host(w, slots, meta),
                           NamedSharding(mesh, P(('data', 'model'),
                                                 None)))
  else:
    meta = None
    table = jax.device_put(w, NamedSharding(mesh, P(('data', 'model'),
                                                    None)))
  ids_d = jax.device_put(ids, NamedSharding(mesh, P(('data', 'model'))))
  got = jax.jit(lambda t, i: emb_ops.ep_pull_sharded(t, i, mesh, meta))(
      table, ids_d)
  np.testing.assert_allclose(np.asarray(got), w[ids], rtol=0, atol=0)


@pytest.mark.parametrize('dim', [1, 16])
def test_dense_update_parity(dim, monkeypatch):
  """The opt-in dense streaming path (EASYREC_PACKED_DENSE=1, for
  saturated tables) — parity vs the plain row update, incl. untouched
  rows."""
  monkeypatch.setenv('EASYREC_PACKED_DENSE', '1')
  _run_both(sparse_lib.sparse_adam(), dim=dim, rows=500, n_ids=3000,
            steps=3)


def test_dense_path_engages_and_grouped_otherwise(monkeypatch):
  monkeypatch.setenv('EASYREC_PACKED_DENSE', '1')
  calls = {}
  orig = pt._rmw_dense_xla

  def spy(*a, **k):
    calls['dense'] = True
    return orig(*a, **k)

  monkeypatch.setattr(pt, '_rmw_dense_xla', spy)
  meta = pt.PackMeta(500, 16, 3)
  rng = np.random.RandomState(0)
  table = jnp.asarray(pt.pack_host(
      rng.randn(500, 16).astype(np.float32) * 0.1,
      [np.zeros((500, 16), np.float32)] * 2, meta))
  opt = sparse_lib.sparse_adam()
  hyp = opt.hypers(jnp.float32(0.01), jnp.int32(0))
  grads = jnp.ones((3000, 16), jnp.float32)
  ids = jnp.asarray(rng.randint(0, 500, 3000).astype(np.int32))
  pt.apply_packed_update(table, ids, grads, hyp, opt.block_math, meta,
                         use_pallas=False)
  assert calls.get('dense'), 'saturated table should go dense'
  calls.clear()
  pt.apply_packed_update(table, ids[:100], grads[:100], hyp,
                         opt.block_math, meta, use_pallas=False)
  assert 'dense' not in calls, 'sparse table should stay grouped'


@pytest.mark.parametrize('use_pallas', [False, True])
def test_gg_bf16_close_to_f32(monkeypatch, use_pallas):
  """The gg-buffer dtype modes (EASYREC_GG_BF16: 'mix' default = bf16
  payload + f32 accumulation, '1' = full bf16, '0' = pure f32; PERF.md
  r3) must stay CLOSE to the f32 path: grads round at ~2^-8 relative
  before the optimizer math, so one Adam step at lr=0.05 may move a
  weight by at most ~lr. Gross cast bugs (wrong lane, wrong part) blow
  way past this tolerance; genuine quality is pinned by the packed e2e
  + learnability AUC gates. The use_pallas=True leg runs the Mosaic RMW
  kernel in interpret mode so the gg_ref .astype(f32) casts in
  _rmw_pallas are exercised off-TPU too (advisor r3 finding)."""
  optimizer = sparse_lib.sparse_adam()
  rows, dim, n_ids = 512, 16, 160
  meta = pt.PackMeta(rows, dim, 1 + len(optimizer.slot_names))
  rng = np.random.RandomState(5)
  w0 = rng.randn(rows, dim).astype(np.float32) * 0.1
  slots0 = [np.full((rows, dim), optimizer.slot_init[i], np.float32)
            for i in range(len(optimizer.slot_names))]
  ids = jnp.asarray(rng.randint(0, rows, n_ids).astype(np.int32))
  grads = jnp.asarray(rng.randn(n_ids, dim).astype(np.float32))
  hyp = optimizer.hypers(jnp.float32(0.05), jnp.int32(0))

  outs = {}
  for flag in ('1', 'mix', '0'):
    monkeypatch.setenv('EASYREC_GG_BF16', flag)
    packed = jnp.asarray(pt.pack_host(w0, slots0, meta))
    out = pt.apply_packed_update(packed, ids, grads, hyp,
                                 optimizer.block_math, meta,
                                 use_pallas=use_pallas,
                                 interpret=use_pallas)
    outs[flag], _ = pt.unpack_host(np.asarray(out), meta, rows)
  # bf16 grads shift the normalized Adam step by O(2^-8 / (|g|+eps))-ish;
  # 0.02 (= 0.4 * lr) catches structural bugs, tolerates rounding
  np.testing.assert_allclose(outs['1'], outs['0'], rtol=0, atol=0.02)
  np.testing.assert_allclose(outs['mix'], outs['0'], rtol=0, atol=0.02)
  for flag in ('1', 'mix'):
    assert not np.allclose(outs[flag], outs['0'], rtol=0, atol=0.0), \
        'EASYREC_GG_BF16=%s appears bit-identical to f32 — not applied?' \
        % flag
