"""Predict CLI: python -m easyrec_tpu.predict --pipeline_config_path ...

Reference surface: easy_rec/python/predict.py (offline batch predict with
the latest checkpoint).
"""

import argparse
import json
import logging
import sys


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser(description='easyrec_tpu predict')
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--input_path', default=None)
  parser.add_argument('--output_path', default=None)
  parser.add_argument('--model_dir', default=None)
  parser.add_argument('--edit_config_json', default=None)
  args = parser.parse_args(argv)
  from easyrec_tpu import main as driver
  edits = json.loads(args.edit_config_json) if args.edit_config_json else {}
  if args.model_dir:
    edits['model_dir'] = args.model_dir
  rows = driver.predict(args.pipeline_config_path,
                        input_path=args.input_path,
                        output_path=args.output_path,
                        edit_config_json=edits or None)
  logging.info('predicted %d rows', len(rows))
  return 0


if __name__ == '__main__':
  sys.exit(main())
