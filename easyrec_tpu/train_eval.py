"""Train CLI: python -m easyrec_tpu.train_eval --pipeline_config_path ...

Reference surface: easy_rec/python/train_eval.py:35-114 (config path,
continue_train, edit_config_json, fine_tune_checkpoint, model_dir override).
"""

import argparse
import json
import logging
import sys


def get_parser() -> argparse.ArgumentParser:
  parser = argparse.ArgumentParser(description='easyrec_tpu train')
  parser.add_argument('--pipeline_config_path', required=True,
                      help='path to the pipeline config file')
  parser.add_argument('--continue_train', action='store_true', default=False,
                      help='continue training from the latest checkpoint')
  parser.add_argument('--model_dir', default=None,
                      help='override model_dir in the config')
  parser.add_argument('--edit_config_json', default=None,
                      help='json dict of dotted-path config edits')
  parser.add_argument('--fine_tune_checkpoint', default=None,
                      help='warm-start checkpoint path')
  parser.add_argument('--num_steps', type=int, default=None,
                      help='override train_config.num_steps')
  parser.add_argument('--fit_on_eval', action='store_true', default=False,
                      help='continue training on eval data after training')
  parser.add_argument('--fit_on_eval_steps', type=int, default=0)
  parser.add_argument('--check_mode', action='store_true', default=False,
                      help='validate every input batch with pointed '
                           'errors (reference --check_mode)')
  return parser


def main(argv=None):
  logging.basicConfig(
      level=logging.INFO,
      format='[%(levelname)s] %(asctime)s %(filename)s:%(lineno)d : '
             '%(message)s')
  args = get_parser().parse_args(argv)
  import os
  if os.environ.get('JAX_COORDINATOR_ADDRESS') or \
      os.environ.get('EASYREC_DISTRIBUTED') == '1':
    # multi-host pod slice: one process per host joins the global mesh
    # (replaces the reference's TF_CONFIG cluster bootstrap)
    import jax
    jax.distributed.initialize()
    logging.info('distributed: process %d/%d', jax.process_index(),
                 jax.process_count())
  from easyrec_tpu import main as driver
  edits = json.loads(args.edit_config_json) if args.edit_config_json else {}
  if args.model_dir:
    edits['model_dir'] = args.model_dir
  if args.fine_tune_checkpoint:
    edits['train_config.fine_tune_checkpoint'] = args.fine_tune_checkpoint
  if args.num_steps is not None:
    edits['train_config.num_steps'] = args.num_steps
  result = driver.train_and_evaluate(
      args.pipeline_config_path,
      continue_train=args.continue_train,
      edit_config_json=edits or None,
      fit_on_eval=args.fit_on_eval,
      fit_on_eval_steps=args.fit_on_eval_steps,
      check_mode=args.check_mode)
  metrics = result.get('eval_metrics', {})
  logging.info('done: step=%s metrics=%s', result['global_step'], metrics)
  return 0


if __name__ == '__main__':
  _rc = main()
  from easyrec_tpu.utils.proc import exit_after
  exit_after(_rc)
