"""Eval CLI: python -m easyrec_tpu.eval --pipeline_config_path ...

Reference surface: easy_rec/python/eval.py.
"""

import argparse
import json
import logging
import sys


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser(description='easyrec_tpu eval')
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--model_dir', default=None)
  parser.add_argument('--eval_input_path', default=None)
  parser.add_argument('--eval_result_filename', default='eval_result.txt')
  parser.add_argument('--edit_config_json', default=None)
  parser.add_argument('--distribute_eval', action='store_true',
                      default=False)
  parser.add_argument('--check_mode', action='store_true', default=False)
  args = parser.parse_args(argv)
  from easyrec_tpu import main as driver
  edits = json.loads(args.edit_config_json) if args.edit_config_json else {}
  if args.model_dir:
    edits['model_dir'] = args.model_dir
  if args.eval_input_path:
    edits['eval_input_path'] = args.eval_input_path
  fn = driver.distribute_evaluate if args.distribute_eval else \
      driver.evaluate
  metrics = fn(args.pipeline_config_path,
               eval_result_filename=args.eval_result_filename,
               edit_config_json=edits or None,
               check_mode=args.check_mode)
  logging.info('eval metrics: %s', metrics)
  return 0


if __name__ == '__main__':
  _rc = main()
  from easyrec_tpu.utils.proc import exit_after
  exit_after(_rc)
