"""Export CLI: python -m easyrec_tpu.export_cli --pipeline_config_path ...

Reference surface: easy_rec/python/export.py.
"""

import argparse
import json
import logging
import sys


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser(description='easyrec_tpu export')
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--export_dir', default=None)
  parser.add_argument('--checkpoint_path', default=None)
  parser.add_argument('--model_dir', default=None)
  parser.add_argument('--edit_config_json', default=None)
  parser.add_argument('--big_model', action='store_true',
                      help='strip embeddings into a file-backed KV '
                           'store for memory-bounded serving (the '
                           'redis/OSS big-model export analog)')
  args = parser.parse_args(argv)
  from easyrec_tpu import main as driver
  edits = json.loads(args.edit_config_json) if args.edit_config_json else {}
  if args.model_dir:
    edits['model_dir'] = args.model_dir
  path = driver.export(args.pipeline_config_path,
                       export_dir=args.export_dir,
                       checkpoint_path=args.checkpoint_path,
                       edit_config_json=edits or None,
                       big_model=args.big_model)
  logging.info('exported to %s', path)
  return 0


if __name__ == '__main__':
  _rc = main()
  from easyrec_tpu.utils.proc import exit_after
  exit_after(_rc)
