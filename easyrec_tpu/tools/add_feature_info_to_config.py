"""Apply a feature-info table to a template pipeline config.

The analog of the reference's tools/add_feature_info_to_config.py
(which reads a `feature,feature_info,message` table from ODPS/Hive):
per-feature info updates embedding_dim / boundaries /
hash_bucket_size, features whose message contains 'DROP IT' are
removed from feature_configs, feature_groups, and seq_att_maps, and
the special `__NUM_STEPS__` / `__DECAY_STEPS__` rows update
train_config. Here the table is a local JSON file (or CSV with
feature,feature_info,message columns) — the warehouse read is a
transport detail.

JSON format:
  {"fea1": {"embedding_dim": 16, "hash_bucket_size": 100000},
   "fea2": {"embedding_dim": 8, "boundary": [0, 1, 2]},
   "fea3": {"message": "DROP IT"},
   "__NUM_STEPS__": {"num_steps": 1000},
   "__DECAY_STEPS__": {"decay_steps": 100}}

CLI:
  python -m easyrec_tpu.tools.add_feature_info_to_config \
      --template_config_path in.config --output_config_path out.config \
      --feature_info_path info.json
"""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os


def load_feature_info(path: str):
  """Returns (info_map, drop_names)."""
  info_map, drops = {}, []
  if path.endswith('.csv'):
    with open(path, newline='') as f:
      for row in csv.DictReader(f):
        name = row['feature']
        info_map[name] = json.loads(row.get('feature_info') or '{}')
        if 'DROP IT' in (row.get('message') or ''):
          drops.append(name)
  else:
    with open(path) as f:
      raw = json.load(f)
    for name, info in raw.items():
      info_map[name] = info
      if 'DROP IT' in str(info.get('message', '')):
        drops.append(name)
  return info_map, drops


def apply_feature_info(pipeline_config, info_map, drop_names):
  """Edit the config in place (same rules as the reference tool)."""
  from easyrec_tpu.config import config_util
  feature_configs = config_util.get_feature_configs(pipeline_config)
  container = (pipeline_config.feature_config.features
               if len(pipeline_config.feature_config.features)
               else pipeline_config.feature_configs)
  keep = [fc for fc in feature_configs
          if fc.input_names[0] not in drop_names]
  if len(keep) != len(feature_configs):
    del container[:]
    container.extend(keep)

  for fc in container:
    name = fc.input_names[0]
    info = info_map.get(name)
    if not info:
      continue
    if 'embedding_dim' in info:
      fc.embedding_dim = int(info['embedding_dim'])
    if 'boundary' in info or 'boundaries' in info:
      del fc.boundaries[:]
      fc.boundaries.extend(
          [float(v) for v in info.get('boundary',
                                      info.get('boundaries'))])
    elif 'hash_bucket_size' in info:
      fc.hash_bucket_size = int(info['hash_bucket_size'])
    logging.info('edited feature %s: %s', name, info)

  if '__NUM_STEPS__' in info_map:
    pipeline_config.train_config.num_steps = int(
        info_map['__NUM_STEPS__']['num_steps'])
  if '__DECAY_STEPS__' in info_map:
    steps = int(info_map['__DECAY_STEPS__']['decay_steps'])
    for oc in pipeline_config.train_config.optimizer_config:
      opt = getattr(oc, oc.WhichOneof('optimizer'))
      lr = getattr(opt.learning_rate,
                   opt.learning_rate.WhichOneof('learning_rate'))
      if hasattr(lr, 'decay_steps'):
        lr.decay_steps = steps

  mc = pipeline_config.model_config
  for group in mc.feature_groups:
    kept = [n for n in group.feature_names if n not in drop_names]
    if len(kept) != len(group.feature_names):
      del group.feature_names[:]
      group.feature_names.extend(kept)
  for seq_group in mc.seq_att_groups:
    for att in seq_group.seq_att_map:
      for field in ('key', 'hist_seq', 'aux_hist_seq'):
        vals = [n for n in getattr(att, field) if n not in drop_names]
        if len(vals) != len(getattr(att, field)):
          att.ClearField(field)
          getattr(att, field).extend(vals)
  return pipeline_config


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser()
  parser.add_argument('--template_config_path', required=True)
  parser.add_argument('--output_config_path', required=True)
  parser.add_argument('--feature_info_path', required=True,
                      help='json map or csv(feature,feature_info,message)')
  args = parser.parse_args(argv)

  from easyrec_tpu.config import config_util
  config = config_util.get_configs_from_pipeline_file(
      args.template_config_path)
  info_map, drops = load_feature_info(args.feature_info_path)
  apply_feature_info(config, info_map, drops)
  out_dir, out_name = os.path.split(args.output_config_path)
  config_util.save_pipeline_config(config, out_dir or '.', out_name)


if __name__ == '__main__':
  main()
