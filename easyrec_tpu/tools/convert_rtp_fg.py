"""Convert an RTP fg.json into a standalone pipeline config file.

Reference: easy_rec/python/tools/convert_rtp_fg.py — generates
data_config.input_fields + feature_config from the RTP feature-generator
description so an RTP user can train without hand-writing feature
configs. The TPU-era equivalent reuses utils/fg_util.convert_rtp_fg and
emits a complete textproto (label + a skeleton model_config the user
fills in, or merged into --base_config if given).

Usage:
  python -m easyrec_tpu.tools.convert_rtp_fg \
      --rtp_fg fg.json --label clk --output_path pipeline.config \
      [--base_config existing.config] [--embedding_dim 16]
"""

from __future__ import annotations

import argparse
import json
import logging

from google.protobuf import text_format

from easyrec_tpu.config import get_configs_from_pipeline_file
from easyrec_tpu.protos import pipeline_pb2
from easyrec_tpu.utils import fg_util


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--rtp_fg', required=True, help='fg.json path')
  p.add_argument('--output_path', required=True)
  p.add_argument('--label', default='', help='label field name '
                 '(prepended to input_fields; fg.json "label" wins)')
  p.add_argument('--base_config', default='',
                 help='existing pipeline config to merge the generated '
                      'data/feature configs into')
  p.add_argument('--embedding_dim', type=int, default=16)
  args = p.parse_args(argv)

  with open(args.rtp_fg) as f:
    fg = json.load(f)

  if args.base_config:
    cfg = get_configs_from_pipeline_file(args.base_config)
    if args.label and not cfg.data_config.label_fields:
      cfg.data_config.label_fields.append(args.label)
    cfg.fg_json_path = args.rtp_fg
    fg_util.load_fg_json_to_config(cfg)
    cfg.fg_json_path = ''              # generated: no runtime dependency
  else:
    cfg = pipeline_pb2.EasyRecConfig()
    labels = [args.label] if args.label else []
    converted = fg_util.convert_rtp_fg(
        fg, embedding_dim=args.embedding_dim, label_fields=labels)
    cfg.data_config.input_fields.extend(converted['input_fields'])
    cfg.data_config.label_fields.extend(converted['label_fields'])
    cfg.feature_config.features.extend(converted['feature_configs'])

  with open(args.output_path, 'w') as f:
    f.write(text_format.MessageToString(cfg, as_utf8=True))
  logging.info('wrote %s (%d input_fields, %d features)',
               args.output_path, len(cfg.data_config.input_fields),
               len(cfg.feature_config.features))


if __name__ == '__main__':
  logging.basicConfig(level=logging.INFO)
  main()
