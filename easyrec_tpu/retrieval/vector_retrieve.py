"""Batch vector retrieval API + CLI.

Reference: easy_rec/python/inference/vector_retrieve.py:25-121 (GraphLearn
KNN ivfflat/ivfpq/flat) — here one exact sharded MIPS index (knn.py).

CLI:
  python -m easyrec_tpu.retrieval.vector_retrieve \
      --query_table q.csv --doc_table d.csv --knn_distance inner_product \
      --top_k 10 --output_table out.csv
Table format: id,v1|v2|...|vD  (embedding separator configurable).
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from easyrec_tpu.retrieval.knn import KnnIndex


def read_embedding_table(path: str, delimiter: str = ',',
                         vector_sep: str = '|'):
  """(ids [N] object, embeddings [N, D] f32) from an id,vec file."""
  ids, vecs = [], []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line:
        continue
      key, vec = line.split(delimiter, 1)
      ids.append(key)
      vecs.append(np.fromstring(vec.replace(vector_sep, ' '), sep=' '))
  return np.asarray(ids, object), np.stack(vecs).astype(np.float32)


class VectorRetrieve:
  """Query-batch KNN over a document embedding table.

  index_type 'flat' = exact sharded MIPS; 'ivf' = k-means IVF
  (faiss 'IVF<k>,Flat' analog, tools/faiss_index_pai.py:31)."""

  def __init__(self, doc_ids, doc_embeddings, metric: str = 'ip',
               index_type: str = 'flat', n_clusters: int = 64,
               nprobe: int = 8):
    if index_type == 'ivf':
      from easyrec_tpu.retrieval.knn import IvfIndex
      self.index = IvfIndex(doc_embeddings, item_ids=doc_ids,
                            metric=metric, n_clusters=n_clusters)
      self._nprobe = nprobe
    else:
      self.index = KnnIndex(doc_embeddings, item_ids=doc_ids,
                            metric=metric)
      self._nprobe = None

  def search(self, query_embeddings, k: int):
    if self._nprobe is not None:
      return self.index.search_ids(query_embeddings, k,
                                   nprobe=self._nprobe)
    return self.index.search_ids(query_embeddings, k)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--query_table', required=True)
  parser.add_argument('--doc_table', required=True)
  parser.add_argument('--output_table', required=True)
  parser.add_argument('--knn_distance', default='inner_product',
                      choices=['inner_product', 'l2', 'cosine'])
  parser.add_argument('--top_k', type=int, default=5)
  parser.add_argument('--attr_delimiter', default=',')
  parser.add_argument('--vector_sep', default='|')
  parser.add_argument('--index_type', default='flat',
                      choices=['flat', 'ivf'])
  parser.add_argument('--n_clusters', type=int, default=64)
  parser.add_argument('--nprobe', type=int, default=8)
  args = parser.parse_args(argv)

  metric = {'inner_product': 'ip', 'l2': 'l2', 'cosine': 'cos'}[
      args.knn_distance]
  doc_ids, doc_emb = read_embedding_table(args.doc_table,
                                          args.attr_delimiter,
                                          args.vector_sep)
  q_ids, q_emb = read_embedding_table(args.query_table,
                                      args.attr_delimiter,
                                      args.vector_sep)
  retr = VectorRetrieve(doc_ids, doc_emb, metric,
                        index_type=args.index_type,
                        n_clusters=args.n_clusters, nprobe=args.nprobe)
  scores, ids = retr.search(q_emb, args.top_k)
  with open(args.output_table, 'w') as f:
    f.write('query,doc,score\n')
    for i, q in enumerate(q_ids):
      for j in range(ids.shape[1]):
        f.write('%s,%s,%.6f\n' % (q, ids[i, j], scores[i, j]))
  logging.info('wrote %s (%d queries x top-%d)', args.output_table,
               len(q_ids), args.top_k)


if __name__ == '__main__':
  main()
