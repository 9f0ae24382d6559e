"""Hitrate evaluation for match models.

Reference: easy_rec/python/tools/hit_rate_{ds,pai}.py +
utils/hit_rate_utils.py:11-97 (GraphLearn KNN hitrate) — here: embed the
eval data with a trained match model, build the exact sharded MIPS index
over the item corpus, report hitrate@k.

  python -m easyrec_tpu.tools.hitrate \
      --pipeline_config_path cfg --top_k 10 [--item_table items.csv]
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np


def compute_hitrate(pipeline_config, top_k: int = 10,
                    max_batches: int = 0) -> dict:
  """Embed eval users/items with the trained model; hitrate@k of each
  row's positive item among the batch-union item corpus."""
  import jax
  from easyrec_tpu.ops import embedding as emb_ops
  from easyrec_tpu.retrieval.knn import KnnIndex, hitrate_at_k
  from easyrec_tpu.train import checkpoints as ckpt_lib
  from easyrec_tpu.train.trainer import Trainer

  trainer = Trainer(pipeline_config)
  eval_iter = iter(trainer.eval_input())
  first = next(eval_iter)
  state = trainer.init_state(first)
  mgr = ckpt_lib.CheckpointManager(pipeline_config.model_dir,
                                 layout_stamp=trainer.layout_stamp())
  restored = mgr.restore_latest(state)
  if restored is None:
    raise FileNotFoundError('no checkpoint under %s' %
                            pipeline_config.model_dir)
  state = restored

  def forward(batch):
    sharded = trainer.rules.shard_batch(batch)
    packs = emb_ops.pack_all_views(trainer.layout, sharded)
    pulled = emb_ops.pull_embeddings(state.tables, packs,
                                     trainer.pack_metas)
    variables = {'params': state.params}
    if state.batch_stats:
      variables['batch_stats'] = state.batch_stats
    out = trainer.module.apply(variables, sharded, pulled, False)
    return (np.asarray(out['user_tower_emb']),
            np.asarray(out['item_tower_emb']),
            np.asarray(batch['sample_weight']) > 0)

  users, items = [], []
  n = 0
  batch = first
  while True:
    u, i, valid = forward(batch)
    users.append(u[valid])
    items.append(i[valid])
    n += 1
    if max_batches and n >= max_batches:
      break
    try:
      batch = next(eval_iter)
    except StopIteration:
      break
  user_emb = np.concatenate(users)
  item_emb = np.concatenate(items)
  # corpus = DISTINCT eval items (eval rows repeat popular items; ranking
  # against duplicates would break ties arbitrarily and understate the
  # hitrate); ground truth for row r is its item's corpus row
  corpus, truth = np.unique(item_emb.round(6), axis=0,
                            return_inverse=True)
  index = KnnIndex(corpus, metric='ip')
  result = hitrate_at_k(index, user_emb, truth, top_k)
  result['corpus_size'] = int(len(corpus))
  logging.info('hitrate: %s', result)
  return result


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--top_k', type=int, default=10)
  parser.add_argument('--max_batches', type=int, default=0)
  parser.add_argument('--output_path', default=None)
  args = parser.parse_args(argv)
  from easyrec_tpu.config import config_util
  config = config_util.get_configs_from_pipeline_file(
      args.pipeline_config_path)
  result = compute_hitrate(config, args.top_k, args.max_batches)
  print(json.dumps(result))
  if args.output_path:
    with open(args.output_path, 'w') as f:
      json.dump(result, f)


if __name__ == '__main__':
  main()
