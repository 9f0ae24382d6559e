"""Inspect an export bundle: signature, variables, assets.

The analog of the reference's tools/view_saved_model.py +
tools/test_saved_model.py (print a SavedModel's signature_def and
optionally run a smoke predict). Works on the bundle written by
easyrec_tpu/export/saved_model.py.

CLI:
  python -m easyrec_tpu.tools.view_export --export_dir <dir> [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from easyrec_tpu.export.saved_model import EXPORT_META, VARIABLES_DIR


def describe_export(export_dir: str) -> dict:
  """Return a json-able summary of the export bundle."""
  meta_path = os.path.join(export_dir, EXPORT_META)
  with open(meta_path) as f:
    meta = json.load(f)

  summary = {'export_dir': export_dir, 'meta': meta}

  var_dir = os.path.join(export_dir, VARIABLES_DIR)
  if os.path.isdir(var_dir):
    try:
      import orbax.checkpoint as ocp
      ckptr = ocp.StandardCheckpointer()
      md = ckptr.metadata(os.path.abspath(var_dir))
      variables = {}

      def walk(prefix, node):
        if hasattr(node, 'shape') and hasattr(node, 'dtype'):
          variables[prefix] = {'shape': list(node.shape),
                               'dtype': str(node.dtype)}
        elif isinstance(node, dict):
          for k, v in node.items():
            walk(f'{prefix}/{k}' if prefix else str(k), v)

      root = getattr(md, 'item_metadata', None) or md
      root = getattr(root, 'tree', root)       # orbax TreeMetadata
      walk('', root)
      summary['variables'] = variables
      summary['num_parameters'] = int(sum(
          int(np.prod(v['shape'])) for v in variables.values()
          if v['shape']))
    except Exception as e:                     # orbax metadata variance
      summary['variables_error'] = str(e)

  kv_dir = os.path.join(export_dir, 'kv_store')
  if os.path.isdir(kv_dir):
    summary['kv_store'] = sorted(os.listdir(kv_dir))
  asset_dir = os.path.join(export_dir, 'assets')
  if os.path.isdir(asset_dir):
    summary['assets'] = sorted(os.listdir(asset_dir))
  return summary


def smoke_predict(export_dir: str) -> dict:
  """Run one synthetic batch through the Predictor; return outputs."""
  from easyrec_tpu.export.predictor import Predictor
  p = Predictor(export_dir)
  rng = np.random.default_rng(0)
  labels = set(p.config.data_config.label_fields)
  needed = set(p.input_names)
  dc = p.config.data_config
  numeric = {dc.FieldType.INT32, dc.FieldType.INT64, dc.FieldType.FLOAT,
             dc.FieldType.DOUBLE, dc.FieldType.BOOL}
  row = {}
  for f in dc.input_fields:
    if f.input_name in labels or f.input_name not in needed:
      continue
    if f.input_type in numeric:
      row[f.input_name] = '%.3f' % rng.uniform()
    else:
      row[f.input_name] = 'id_%d' % rng.integers(0, 100)
  out = p.predict([row])[0]
  return {k: (float(v) if np.isscalar(v) or getattr(v, 'ndim', 1) == 0
              else np.asarray(v).tolist()) for k, v in out.items()}


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--export_dir', required=True)
  parser.add_argument('--smoke', action='store_true',
                      help='run one synthetic row through the Predictor')
  args = parser.parse_args(argv)
  summary = describe_export(args.export_dir)
  if args.smoke:
    summary['smoke_outputs'] = smoke_predict(args.export_dir)
  print(json.dumps(summary, indent=2, default=str))


if __name__ == '__main__':
  main()
