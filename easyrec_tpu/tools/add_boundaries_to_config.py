"""Auto-bucketize raw features: scan the training data, compute quantile
boundaries for every RawFeature with an embedding, and write them into
the config.

Reference: easy_rec/python/tools/add_boundaries_to_config.py (reads ODPS
stats tables); here the quantiles are computed directly from the training
files.

  python -m easyrec_tpu.tools.add_boundaries_to_config \
      --pipeline_config_path cfg --num_buckets 20 \
      [--output_config_path out.config]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np


def add_boundaries(pipeline_config, num_buckets: int = 20,
                   max_rows: int = 1_000_000) -> int:
  """Mutates the config in place; returns #features bucketized."""
  from easyrec_tpu.config import config_util
  from easyrec_tpu.data.input_pipeline import create_reader
  from easyrec_tpu.features import transforms as tr
  from easyrec_tpu.protos import data_pb2

  FeatureType = data_pb2.FeatureConfig.FeatureType
  feature_configs = config_util.get_feature_configs(pipeline_config)
  raw_feats = [fc for fc in feature_configs
               if fc.feature_type == FeatureType.RawFeature and
               not list(fc.boundaries)]
  if not raw_feats:
    return 0
  names = {fc.input_names[0] for fc in raw_feats}
  reader = create_reader(pipeline_config.data_config,
                         config_util.get_train_input_path(pipeline_config))
  samples = {n: [] for n in names}
  rows = 0
  for chunk in reader.chunks(65536):
    for n in names:
      if n in chunk:
        samples[n].append(tr._to_float(chunk[n]))
    rows += len(next(iter(chunk.values())))
    if rows >= max_rows:
      break
  changed = 0
  for fc in raw_feats:
    n = fc.input_names[0]
    if not samples[n]:
      continue
    vals = np.concatenate(samples[n])
    qs = np.quantile(vals, np.linspace(0, 1, num_buckets + 1)[1:-1])
    bounds = sorted(set(float(np.round(q, 6)) for q in qs))
    del fc.boundaries[:]
    fc.boundaries.extend(bounds)
    changed += 1
    logging.info('feature %s: %d boundaries %s...', n, len(bounds),
                 bounds[:4])
  return changed


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser()
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--output_config_path', default=None)
  parser.add_argument('--num_buckets', type=int, default=20)
  args = parser.parse_args(argv)
  from easyrec_tpu.config import config_util
  config = config_util.get_configs_from_pipeline_file(
      args.pipeline_config_path)
  n = add_boundaries(config, args.num_buckets)
  out = args.output_config_path or args.pipeline_config_path
  import os
  config_util.save_pipeline_config(config, os.path.dirname(out) or '.',
                                   os.path.basename(out))
  logging.info('bucketized %d features -> %s', n, out)


if __name__ == '__main__':
  main()
