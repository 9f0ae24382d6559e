"""Convert a pipeline config between text-format (.config) and JSON.

Analog of reference tools/convert_config_format.py: the extension of
each path picks the codec.

Usage:
  python -m easyrec_tpu.tools.convert_config_format \
      --input_config pipeline.config --output_config pipeline.json
"""

from __future__ import annotations

import argparse
import os

from google.protobuf import json_format
from google.protobuf import text_format

from easyrec_tpu.protos.pipeline_pb2 import EasyRecConfig


def load_config(path: str) -> EasyRecConfig:
  config = EasyRecConfig()
  with open(path, 'r') as f:
    content = f.read()
  if path.endswith('.json'):
    json_format.Parse(content, config, ignore_unknown_fields=True)
  elif path.endswith('.config'):
    text_format.Parse(content, config, allow_unknown_field=True)
  else:
    raise ValueError('only .config/.json are supported (%s)' % path)
  return config


def save_config(config: EasyRecConfig, path: str) -> None:
  with open(path, 'w') as f:
    if path.endswith('.json'):
      f.write(json_format.MessageToJson(
          config, preserving_proto_field_name=True))
    elif path.endswith('.config'):
      f.write(text_format.MessageToString(config, as_utf8=True))
    else:
      raise ValueError('only .config/.json are supported (%s)' % path)


def main(argv=None) -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--input_config', required=True)
  parser.add_argument('--output_config', required=True)
  args = parser.parse_args(argv)
  assert os.path.exists(args.input_config), args.input_config
  save_config(load_config(args.input_config), args.output_config)
  print('wrote %s' % args.output_config)


if __name__ == '__main__':
  main()
