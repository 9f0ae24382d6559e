"""Embedding engine tests: fused layout, lookup parity vs numpy,
sparse optimizer correctness vs dense reference, sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyrec_tpu.config import get_configs_from_pipeline_str
from easyrec_tpu.features import feature_spec as fs
from easyrec_tpu.features.embedding_layout import EmbeddingLayout
from easyrec_tpu.ops import embedding as emb_ops
from easyrec_tpu.optim import sparse as sparse_lib

CONFIG = """
train_input_path: "x"
model_dir: "/tmp/x"
data_config {
  batch_size: 4
  input_fields { input_name: "a" input_type: STRING }
  input_fields { input_name: "b" input_type: STRING }
  input_fields { input_name: "c" input_type: FLOAT }
  input_fields { input_name: "s" input_type: STRING }
  input_type: CSVInput
}
feature_config {
  features { input_names: "a" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 50 }
  features { input_names: "b" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 30 max_multi_len: 3 }
  features { input_names: "c" feature_type: RawFeature embedding_dim: 8 }
  features { input_names: "s" feature_type: SequenceFeature
             embedding_dim: 8 hash_bucket_size: 20 max_seq_len: 4 }
}
model_config { model_class: "DeepFM" }
"""


@pytest.fixture(scope='module')
def setup():
  cfg = get_configs_from_pipeline_str(CONFIG)
  specs = fs.build_feature_specs(cfg.feature_config.features)
  layout = EmbeddingLayout(specs, deep_features=['a', 'b', 'c'],
                           wide_features=['a', 'b'], wide_output_dim=2,
                           seq_features=['s'])
  tables = {k: jnp.asarray(v) for k, v in layout.init_tables(0).items()}
  batch = {
      'feat.a.ids': jnp.array([[3], [7], [3], [0]], dtype=jnp.int32),
      'feat.a.weights': jnp.array([[1.], [1.], [1.], [0.]]),
      'feat.b.ids': jnp.array(
          [[1, 2, 0], [4, 0, 0], [1, 2, 5], [0, 0, 0]], dtype=jnp.int32),
      'feat.b.weights': jnp.array(
          [[1., 1., 0.], [2., 0., 0.], [1., 1., 1.], [0., 0., 0.]]),
      'feat.c.ids': jnp.zeros((4, 1), dtype=jnp.int32),
      'feat.c.weights': jnp.array([[0.5], [1.5], [0.0], [2.0]]),
      'feat.s.ids': jnp.array(
          [[1, 2, 3, 0], [4, 0, 0, 0], [0] * 4, [5, 6, 0, 0]],
          dtype=jnp.int32),
      'feat.s.mask': jnp.array(
          [[1., 1., 1., 0.], [1., 0., 0., 0.], [0.] * 4, [1., 1., 0., 0.]]),
  }
  return cfg, specs, layout, tables, batch


def test_layout_fusion(setup):
  _, specs, layout, tables, _ = setup
  # a(50) + b(30) + c(1) + s(20) share dim 8 -> one fused table
  # (+1 scratch); a/b's wide columns MERGE into the same rows (cols
  # [8:10) of the padded 16-wide table) — no separate wide table
  assert set(layout.tables) == {'emb8'}
  t = layout.tables['emb8']
  assert t.rows == 50 + 30 + 1 + 20 + 1
  assert t.used_dim == 8 + 2 and t.dim == 16
  # packed id axis: a(1) + b(3) + c(1) + s(4) — wide adds no slots
  assert t.tot_k == 9
  _, wa = layout.feature_use[('a', 'wide')]
  assert (wa.col_start, wa.col_dim) == (8, 2)
  _, da = layout.feature_use[('a', 'deep')]
  assert (da.col_start, da.col_dim) == (0, 8)
  assert wa.start == da.start


def test_lookup_parity_vs_numpy(setup):
  _, specs, layout, tables, batch = setup
  packs = emb_ops.pack_ids(layout, batch)
  pulled = emb_ops.pull_embeddings(tables, packs)
  input_layer = emb_ops.InputLayer(layout, specs)

  emb_a = input_layer.feature_embedding(pulled, batch, 'a')
  table = np.asarray(tables['emb8'])[:, :8]      # deep cols of the
  wtable = np.asarray(tables['emb8'])[:, 8:10]   # merged layout
  off_a = layout.tables['emb8'].offsets['a']
  expect = table[np.asarray(batch['feat.a.ids'][:, 0]) + off_a] * \
      np.asarray(batch['feat.a.weights'])
  np.testing.assert_allclose(np.asarray(emb_a), expect, rtol=1e-5)

  # tag combine (sum of weighted rows)
  emb_b = input_layer.feature_embedding(pulled, batch, 'b')
  off_b = layout.tables['emb8'].offsets['b']
  ids_b = np.asarray(batch['feat.b.ids']) + off_b
  w_b = np.asarray(batch['feat.b.weights'])
  expect_b = np.einsum('bk,bkd->bd', w_b, table[ids_b])
  np.testing.assert_allclose(np.asarray(emb_b), expect_b, rtol=1e-5)

  # raw projection: value * row0
  emb_c = input_layer.feature_embedding(pulled, batch, 'c')
  off_c = layout.tables['emb8'].offsets['c']
  expect_c = np.asarray(batch['feat.c.weights']) * table[off_c][None, :]
  np.testing.assert_allclose(np.asarray(emb_c), expect_c, rtol=1e-5)

  # sequence: [B, L, D] with mask applied
  seq, mask = input_layer.sequence_embedding(pulled, batch, 's')
  assert seq.shape == (4, 4, 8)
  np.testing.assert_allclose(np.asarray(seq[2]), np.zeros((4, 8)), atol=1e-7)

  # wide sums read the merged wide columns of the same rows
  wide = input_layer.wide_logits(pulled, batch, ['a', 'b'])
  assert wide.shape == (4, 2)
  ids_a = np.asarray(batch['feat.a.ids']) + off_a
  exp_wide = (np.einsum('bk,bkd->bd', np.asarray(batch['feat.a.weights']),
                        wtable[ids_a]) +
              np.einsum('bk,bkd->bd', w_b, wtable[ids_b]))
  np.testing.assert_allclose(np.asarray(wide), exp_wide, rtol=1e-5)


def test_mean_max_combiners():
  rows = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
  w = jnp.array([[1., 1., 0.], [0., 0., 0.]])
  mean = emb_ops.combine(rows, w, 'mean')
  np.testing.assert_allclose(np.asarray(mean[0]),
                             np.asarray((rows[0, 0] + rows[0, 1]) / 2))
  np.testing.assert_allclose(np.asarray(mean[1]), np.zeros(4))
  mx = emb_ops.combine(rows, w, 'max')
  np.testing.assert_allclose(np.asarray(mx[0]), np.asarray(rows[0, 1]))
  np.testing.assert_allclose(np.asarray(mx[1]), np.zeros(4))


def test_dedup_sum():
  ids = jnp.array([5, 3, 5, 7, 3, 5], dtype=jnp.int32)
  g = jnp.ones((6, 2), dtype=jnp.float32)
  uids, ug = sparse_lib.dedup_sum(ids, g, scratch_row=99)
  got = {int(i): tuple(np.asarray(v)) for i, v in zip(uids, ug)
         if int(i) != 99}
  assert got == {3: (2., 2.), 5: (3., 3.), 7: (1., 1.)}
  # padding slots -> scratch row with zero grad
  pad = [tuple(np.asarray(v)) for i, v in zip(uids, ug) if int(i) == 99]
  assert all(p == (0., 0.) for p in pad)


def test_sparse_adam_matches_dense_adam():
  """Lazy adam on touched rows == optax adam restricted to touched rows."""
  import optax
  rows, dim = 16, 4
  rng = np.random.default_rng(0)
  table0 = rng.normal(size=(rows, dim)).astype(np.float32)
  ids = jnp.array([1, 3, 3, 9], dtype=jnp.int32)
  g_rows = jnp.asarray(rng.normal(size=(4, dim)).astype(np.float32))

  # dense grads equivalent
  dense_g = np.zeros((rows, dim), dtype=np.float32)
  for i, idx in enumerate(np.asarray(ids)):
    dense_g[idx] += np.asarray(g_rows)[i]

  opt = optax.adam(0.01)
  state = opt.init(jnp.asarray(table0))
  upd, _ = opt.update(jnp.asarray(dense_g), state, jnp.asarray(table0))
  dense_result = np.asarray(jnp.asarray(table0) + upd)

  sopt = sparse_lib.sparse_adam()
  sstate = sopt.init(jnp.asarray(table0))
  uids, ug = sparse_lib.dedup_sum(ids, g_rows, scratch_row=15)
  new_table, _ = sopt.update_rows(jnp.asarray(table0), sstate, uids, ug,
                                  jnp.float32(0.01), jnp.int32(0))
  new_table = np.asarray(new_table)
  for r in (1, 3, 9):
    np.testing.assert_allclose(new_table[r], dense_result[r], rtol=1e-4)
  # untouched rows unchanged
  for r in (0, 2, 5):
    np.testing.assert_allclose(new_table[r], table0[r])


def test_sharded_lookup_runs_on_mesh(setup):
  """Full pull+combine under jit on an 8-device mesh with row-sharded
  tables and data-sharded batch."""
  from easyrec_tpu.parallel.mesh import build_mesh, ShardingRules
  cfg, specs, layout, _, batch = setup
  mesh = build_mesh()
  assert mesh.devices.size == 8
  rules = ShardingRules(mesh)
  tables_np = layout.init_tables(0, pad_rows_to=rules.table_pad_rows())
  tables = rules.shard_tables(tables_np)
  # batch of 8 rows (divisible by mesh)
  batch8 = {k: jnp.concatenate([v, v], axis=0) for k, v in batch.items()}
  batch8 = rules.shard_batch({k: np.asarray(v) for k, v in batch8.items()})

  @jax.jit
  def fwd(tables, batch):
    packs = emb_ops.pack_ids(layout, batch)
    pulled = emb_ops.pull_embeddings(tables, packs)
    il = emb_ops.InputLayer(layout, specs)
    return il.group_concat(pulled, batch, ['a', 'b', 'c'])

  out = fwd(tables, batch8)
  assert out.shape == (8, 24)
  # parity with unsharded numpy path
  tables_local = {k: jnp.asarray(v) for k, v in tables_np.items()}
  packs = emb_ops.pack_ids(layout, {k: jnp.asarray(np.asarray(v))
                                    for k, v in batch8.items()})
  pulled = emb_ops.pull_embeddings(tables_local, packs)
  il = emb_ops.InputLayer(layout, specs)
  expect = il.group_concat(pulled,
                           {k: jnp.asarray(np.asarray(v))
                            for k, v in batch8.items()}, ['a', 'b', 'c'])
  np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)


def test_merge_shared_embedding_wide():
  """Two features SHARING a deep table, both in the wide group: their
  merged wide columns share rows exactly like the old separate
  '<table>__wide' fusion did (same table_name -> same rows)."""
  cfg = get_configs_from_pipeline_str(CONFIG.replace(
      'features { input_names: "b" feature_type: TagFeature\n'
      '             embedding_dim: 8 hash_bucket_size: 30 '
      'max_multi_len: 3 }',
      'features { input_names: "b" feature_type: TagFeature\n'
      '             embedding_dim: 8 hash_bucket_size: 50 '
      'max_multi_len: 3 embedding_name: "a" }'))
  specs = fs.build_feature_specs(cfg.feature_config.features)
  layout = EmbeddingLayout(specs, deep_features=['a', 'b'],
                           wide_features=['a', 'b'], wide_output_dim=2)
  t = layout.tables['emb8']
  assert t.used_dim == 10 and t.dim == 16
  _, ua = layout.feature_use[('a', 'wide')]
  _, ub = layout.feature_use[('b', 'wide')]
  assert ua.offset == ub.offset          # shared rows
  assert ua.col_start == ub.col_start == 8


def test_merge_disabled_env(monkeypatch):
  monkeypatch.setenv('EASYREC_MERGE_WIDE', '0')
  cfg = get_configs_from_pipeline_str(CONFIG)
  specs = fs.build_feature_specs(cfg.feature_config.features)
  layout = EmbeddingLayout(specs, deep_features=['a', 'b', 'c'],
                           wide_features=['a', 'b'], wide_output_dim=2,
                           seq_features=['s'])
  assert set(layout.tables) == {'emb8', 'wide2'}
  assert layout.tables['emb8'].dim == 8


def test_merge_wide_only_feature_keeps_wide_table():
  """A wide feature with NO deep use cannot merge: it keeps its own
  wide table while the deep+wide features merge."""
  cfg = get_configs_from_pipeline_str(CONFIG)
  specs = fs.build_feature_specs(cfg.feature_config.features)
  layout = EmbeddingLayout(specs, deep_features=['a', 'c'],
                           wide_features=['a', 'b'], wide_output_dim=2)
  assert set(layout.tables) == {'emb8', 'wide2'}
  assert 'b' not in layout.merged_wide and 'a' in layout.merged_wide
  assert layout.tables['wide2'].rows == 30 + 1
