"""Split a trained match model's export into user / item tower servings.

Reference: easy_rec/python/tools/split_model_pai.py (+
split_pdn_model_pai.py): recall serving runs the item tower offline (to
build the index) and the user tower online, so each side gets its own
serving bundle that only requires its own features.

  python -m easyrec_tpu.tools.split_model \
      --export_dir <model_dir>/export/final/<ts> \
      --output_dir <dir>       # writes <dir>/user and <dir>/item
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil


TOWER_OUTPUTS = {
    'user': ['user_emb', 'user_tower_emb', 'user_interests'],
    'item': ['item_emb', 'item_tower_emb'],
}


def split_export(export_dir: str, output_dir: str) -> dict:
  """Copy the export twice, restricting each copy's signature to one
  tower (inputs = that tower's feature group, outputs = its embedding).
  """
  from easyrec_tpu.config import config_util
  from easyrec_tpu.export import saved_model as sm

  config, _ = sm.load_serving_state(export_dir)
  groups = {g.group_name: list(g.feature_names)
            for g in config.model_config.feature_groups}
  feature_inputs = {}
  for fc in config_util.get_feature_configs(config):
    name = fc.feature_name or fc.input_names[0]
    feature_inputs[name] = list(fc.input_names)

  with open(os.path.join(export_dir, sm.EXPORT_META)) as f:
    meta = json.load(f)

  out = {}
  for tower in ('user', 'item'):
    # tower features: the 'user'/'item' groups plus any '<tower>_*' groups
    feats = []
    for gname, names in groups.items():
      if gname == tower or gname.startswith(tower + '_') or \
          (tower == 'user' and gname == 'hist'):
        feats.extend(names)
    if not feats:
      logging.warning('no %r feature group found; skipping tower', tower)
      continue
    dst = os.path.join(output_dir, tower)
    if os.path.exists(dst):
      shutil.rmtree(dst)
    shutil.copytree(export_dir, dst)
    tower_meta = dict(meta)
    tower_meta['tower'] = tower
    tower_meta['outputs'] = [o for o in meta.get('outputs', [])
                             if o in TOWER_OUTPUTS[tower]]
    tower_meta['inputs'] = {f: meta.get('inputs', {}).get(f, {})
                            for f in feats}
    tower_meta['required_columns'] = sorted(
        {c for f in feats for c in feature_inputs.get(f, [f])})
    with open(os.path.join(dst, sm.EXPORT_META), 'w') as f:
      json.dump(tower_meta, f, indent=2)
    out[tower] = dst
    logging.info('%s tower -> %s (outputs=%s)', tower, dst,
                 tower_meta['outputs'])
  return out


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser()
  parser.add_argument('--export_dir', required=True)
  parser.add_argument('--output_dir', required=True)
  args = parser.parse_args(argv)
  result = split_export(args.export_dir, args.output_dir)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
