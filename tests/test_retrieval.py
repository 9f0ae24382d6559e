"""Sharded exact top-k MIPS retrieval: correctness vs numpy brute force,
hitrate, vector-retrieve CLI round-trip."""

import os

import numpy as np
import pytest

from easyrec_tpu.retrieval.knn import KnnIndex, hitrate_at_k


@pytest.mark.parametrize('metric', ['ip', 'cos', 'l2'])
def test_knn_matches_numpy(metric):
  rng = np.random.default_rng(0)
  items = rng.normal(size=(1000, 16)).astype(np.float32)
  queries = rng.normal(size=(32, 16)).astype(np.float32)
  index = KnnIndex(items, metric=metric)
  scores, idx = index.search(queries, 10)
  assert idx.shape == (32, 10)

  if metric == 'cos':
    a = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    b = items / np.linalg.norm(items, axis=1, keepdims=True)
    ref = a @ b.T
  elif metric == 'l2':
    ref = 2 * queries @ items.T - np.sum(items * items, axis=1)[None, :]
  else:
    ref = queries @ items.T
  ref_idx = np.argsort(-ref, axis=1)[:, :10]
  # same candidate SET per row (ties may reorder)
  for r in range(32):
    assert set(idx[r]) == set(ref_idx[r]), (metric, r)


def test_knn_odd_sizes_and_ids():
  """item count not divisible by the 8-device mesh; id mapping."""
  rng = np.random.default_rng(1)
  items = rng.normal(size=(173, 8)).astype(np.float32)
  ids = np.array(['item_%d' % i for i in range(173)], object)
  index = KnnIndex(items, item_ids=ids, metric='cos')
  q = items[:5]  # under cosine, each item's own vector is its top hit
  scores, hit_ids = index.search_ids(q, 1)
  assert list(hit_ids[:, 0]) == ['item_0', 'item_1', 'item_2', 'item_3',
                                 'item_4']


def test_hitrate():
  rng = np.random.default_rng(2)
  items = rng.normal(size=(500, 16)).astype(np.float32)
  index = KnnIndex(items, metric='ip')
  # queries ARE the items (plus noise): own row must be in top-5
  queries = items + rng.normal(scale=1e-3, size=items.shape).astype(
      np.float32)
  result = hitrate_at_k(index, queries[:200], np.arange(200), 5)
  assert result['hitrate@5'] > 0.99
  # random queries: hitrate near chance
  rand = rng.normal(size=(200, 16)).astype(np.float32)
  low = hitrate_at_k(index, rand, np.arange(200), 5)
  assert low['hitrate@5'] < 0.2


def test_vector_retrieve_cli(tmp_path):
  from easyrec_tpu.retrieval import vector_retrieve as vr
  rng = np.random.default_rng(3)
  docs = rng.normal(size=(50, 8)).astype(np.float32)
  doc_path = os.path.join(str(tmp_path), 'docs.csv')
  q_path = os.path.join(str(tmp_path), 'queries.csv')
  out_path = os.path.join(str(tmp_path), 'out.csv')
  with open(doc_path, 'w') as f:
    for i, v in enumerate(docs):
      f.write('d%d,%s\n' % (i, '|'.join('%.5f' % x for x in v)))
  with open(q_path, 'w') as f:
    for i in (3, 7):
      f.write('q%d,%s\n' % (i, '|'.join('%.5f' % x for x in docs[i])))
  vr.main(['--query_table', q_path, '--doc_table', doc_path,
           '--output_table', out_path, '--top_k', '3',
           '--knn_distance', 'cosine'])
  lines = open(out_path).read().strip().splitlines()
  assert lines[0] == 'query,doc,score'
  assert len(lines) == 1 + 2 * 3
  # each query's top hit is its own doc
  assert lines[1].startswith('q3,d3,')
  assert lines[4].startswith('q7,d7,')


def test_ivf_index_recall_vs_exact():
  """IvfIndex (k-means IVF, faiss IVFFlat analog): high recall vs the
  exact index at modest nprobe, exact at nprobe=n_clusters."""
  import numpy as np
  from easyrec_tpu.retrieval.knn import IvfIndex, KnnIndex
  rng = np.random.default_rng(0)
  # clustered corpus so IVF has structure to find
  centers = rng.normal(size=(16, 32)) * 3
  items = (centers[rng.integers(0, 16, 2000)] +
           rng.normal(size=(2000, 32))).astype(np.float32)
  queries = (centers[rng.integers(0, 16, 64)] +
             rng.normal(size=(64, 32))).astype(np.float32)

  exact = KnnIndex(items, metric='ip')
  ivf = IvfIndex(items, metric='ip', n_clusters=32, n_iters=8)
  _, true_idx = exact.search(queries, 10)
  _, ivf_idx = ivf.search(queries, 10, nprobe=8)
  recall = np.mean([len(set(a) & set(b)) / 10.0
                    for a, b in zip(true_idx, ivf_idx)])
  assert recall > 0.9, recall

  # probing every cluster = exact
  _, all_idx = ivf.search(queries, 10, nprobe=32)
  full_recall = np.mean([len(set(a) & set(b)) / 10.0
                         for a, b in zip(true_idx, all_idx)])
  assert full_recall == 1.0, full_recall


def test_ivf_k_clamped_to_pool_and_padding_rows():
  """k larger than the probed candidate pool is clamped, and
  under-filled pools return -1 rows instead of fabricating item 0
  (code-review regression)."""
  import numpy as np
  from easyrec_tpu.retrieval.knn import IvfIndex
  rng = np.random.default_rng(1)
  items = rng.normal(size=(100, 8)).astype(np.float32)
  ivf = IvfIndex(items, metric='ip', n_clusters=20, n_iters=4)
  q = rng.normal(size=(3, 8)).astype(np.float32)
  scores, rows = ivf.search(q, k=5000, nprobe=2)
  assert rows.shape[1] <= 2 * ivf.buckets.shape[1]
  # any slot beyond the valid candidates is -1 with -inf score
  invalid = rows < 0
  if invalid.any():
    assert np.all(np.isneginf(scores[invalid]))
  _, ids = ivf.search_ids(q, k=5000, nprobe=2)
  assert ((ids >= -1)).all()
