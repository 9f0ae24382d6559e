"""Feature-importance report from a variational-dropout checkpoint.

Reference: easy_rec/python/tools/feature_selection.py (reads learned
variational-dropout rates and ranks features). Usage:

  python -m easyrec_tpu.tools.feature_selection \
      --pipeline_config_path cfg --output_path report.csv [--topk 50]
"""

from __future__ import annotations

import argparse
import json
import logging


def feature_importance(pipeline_config) -> dict:
  """{feature_name: importance in [0,1]} from the latest checkpoint."""
  import numpy as np
  from easyrec_tpu.train import checkpoints as ckpt_lib
  from easyrec_tpu.train.trainer import Trainer

  trainer = Trainer(pipeline_config)
  batch = next(iter(trainer.eval_input()))
  state = trainer.init_state(batch)
  mgr = ckpt_lib.CheckpointManager(pipeline_config.model_dir,
                                 layout_stamp=trainer.layout_stamp())
  restored = mgr.restore_latest(state)
  if restored is None:
    raise FileNotFoundError('no checkpoint under %s' %
                            pipeline_config.model_dir)

  import jax
  result = {}
  for path, leaf in jax.tree_util.tree_leaves_with_path(restored.params):
    keys = [p.key for p in path if hasattr(p, 'key')]
    if keys and keys[-1] == 'logit_p':
      p = 1.0 / (1.0 + np.exp(-np.asarray(leaf, np.float64)))
      importance = 1.0 - p
      # per-feature names from the owning VariationalDropout module
      block = next((k for k in keys if 'variational_dropout' in k), '')
      gname = block.replace('_variational_dropout', '')
      names = _group_feature_names(pipeline_config, gname)
      if importance.ndim == 0 or len(names) != importance.shape[0]:
        for i, v in enumerate(np.atleast_1d(importance)):
          result['%s/dim_%d' % (block, i)] = float(v)
      else:
        for name, v in zip(names, importance):
          result[name] = float(v)
  if not result:
    raise ValueError('checkpoint has no variational_dropout parameters — '
                     'set model_config.variational_dropout and retrain')
  return result


def _group_feature_names(config, block_name: str):
  """Feature names behind an input_layer block (the VD module's owner):
  resolve block -> feature group -> feature_names."""
  group_name = block_name
  mc = config.model_config
  if mc.HasField('backbone'):
    for b in mc.backbone.blocks:
      if b.name == block_name:
        if b.inputs and b.inputs[0].feature_group_name:
          group_name = b.inputs[0].feature_group_name
        break
  for g in mc.feature_groups:
    if g.group_name == group_name:
      return list(g.feature_names)
  return []


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--output_path', default=None)
  parser.add_argument('--topk', type=int, default=0)
  args = parser.parse_args(argv)

  from easyrec_tpu.config import config_util
  config = config_util.get_configs_from_pipeline_file(
      args.pipeline_config_path)
  imp = feature_importance(config)
  ranked = sorted(imp.items(), key=lambda kv: -kv[1])
  if args.topk:
    ranked = ranked[:args.topk]
  for name, v in ranked:
    print('%s,%.6f' % (name, v))
  if args.output_path:
    with open(args.output_path, 'w') as f:
      json.dump(dict(ranked), f, indent=2)
    logging.info('wrote %s', args.output_path)


if __name__ == '__main__':
  main()
