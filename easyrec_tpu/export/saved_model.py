"""Serving export: a self-contained directory with config + weights + meta.

The TPU-native analog of the reference's SavedModel export
(easy_rec/python/model/easy_rec_estimator.py:567-659): the export carries
the pipeline config (so serving re-creates the exact host feature
transforms), the inference variables (params, batch_stats, embedding
tables) via orbax, and a signature meta json. `Predictor` in predictor.py
loads it and serves batch or online predictions.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from easyrec_tpu.config import config_util

EXPORT_META = 'export_meta.json'
VARIABLES_DIR = 'variables'
CONFIG_FILE = 'pipeline.config'


def export_saved_model(trainer, state, export_base_dir: str,
                       assets: Optional[list] = None,
                       extra_meta: Optional[dict] = None,
                       big_model: bool = False) -> str:
  """Write a timestamped export under export_base_dir, return its path.

  big_model=True strips the embedding tables out of the variables
  bundle into a file-backed KV store for memory-bounded serving
  (export/big_model.py — the redis/OSS big-model export analog,
  reference utils/export_big_model.py)."""
  stamp = str(int(time.time()))
  export_dir = os.path.join(export_base_dir, stamp)
  os.makedirs(export_dir, exist_ok=True)

  config_util.save_pipeline_config(trainer.pipeline_config, export_dir,
                                   CONFIG_FILE)

  tables = jax.device_get(state.tables)
  if getattr(trainer, 'pack_metas', None):
    # exports always carry the LOGICAL [rows, dim] weights so serving and
    # incremental updates are independent of the training-side packing
    # (optimizer slots are not exported, like the reference SavedModel)
    from easyrec_tpu.ops import packed_table as pt
    tables = {k: pt.unpack_host(np.asarray(v), trainer.pack_metas[k])[0]
              for k, v in tables.items()}
  if big_model:
    from easyrec_tpu.export import big_model as bm
    bm.write_kv_store(export_dir, tables)
    tables = {}
  serving_state = {
      'params': jax.device_get(trainer.eval_params(state)
                               if hasattr(trainer, 'eval_params')
                               else state.params),
      'batch_stats': jax.device_get(state.batch_stats),
      'tables': tables,
      'step': np.asarray(state.step),
  }
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.join(os.path.abspath(export_dir), VARIABLES_DIR),
             serving_state)
  ckptr.wait_until_finished()

  ec = trainer.pipeline_config.export_config
  outputs = set(_output_names(trainer))
  if ec.export_rtp_outputs and ('probs' in outputs or 'y' in outputs):
    outputs.add('rank_predict')
  meta = {
      'model_class': trainer.pipeline_config.model_config.model_class,
      'export_time': stamp,
      'global_step': int(np.asarray(state.step)),
      'outputs': sorted(outputs),
      'inputs': _input_signature(trainer),
      'framework': 'easyrec_tpu',
      'big_model': bool(big_model),
      # serving-side output options (reference export.proto:13-59 +
      # _export_model_fn easy_rec_estimator.py:567-659)
      'export_features': bool(ec.export_features),
      'export_rtp_outputs': bool(ec.export_rtp_outputs),
  }
  if extra_meta:
    meta.update(extra_meta)
  with open(os.path.join(export_dir, EXPORT_META), 'w') as f:
    json.dump(meta, f, indent=2)

  if assets:
    asset_dir = os.path.join(export_dir, 'assets')
    os.makedirs(asset_dir, exist_ok=True)
    for path in assets:
      shutil.copy(path, asset_dir)

  # exports_to_keep (reference export.proto: Latest exporter GC):
  # prune older timestamped exports beyond the configured count
  keep = max(int(ec.exports_to_keep), 1)
  stamps = sorted(d for d in os.listdir(export_base_dir)
                  if d.isdigit() and
                  os.path.isdir(os.path.join(export_base_dir, d)))
  for old in stamps[:-keep]:
    shutil.rmtree(os.path.join(export_base_dir, old), ignore_errors=True)
  return export_dir


def _output_names(trainer) -> list:
  # probe output keys from a tiny synthetic batch
  from easyrec_tpu.utils.synthetic import synthetic_batch
  from easyrec_tpu.ops import embedding as emb_ops
  batch = synthetic_batch(trainer.specs, trainer.ctx.label_fields, 8)
  state = trainer.init_state(batch)
  sharded = trainer.rules.shard_batch(batch)
  packs = emb_ops.pack_ids(trainer.layout, sharded)
  pulled = emb_ops.pull_embeddings(state.tables, packs,
                                   getattr(trainer, 'pack_metas', None))
  variables = {'params': state.params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats
  outputs = trainer.module.apply(variables, sharded, pulled, False)
  exported = trainer.model.export_outputs(outputs)
  return list(exported.keys())


def _input_signature(trainer) -> Dict[str, dict]:
  sig = {}
  for fc in trainer.feature_configs:
    name = fc.feature_name or fc.input_names[0]
    sig[name] = {
        'input_names': list(fc.input_names),
        'feature_type': type(fc).FeatureType.Name(fc.feature_type),
    }
  return sig


def load_serving_state(export_dir: str):
  """Returns (pipeline_config, serving_state dict)."""
  config = config_util.get_configs_from_pipeline_file(
      os.path.join(export_dir, CONFIG_FILE))
  ckptr = ocp.StandardCheckpointer()
  state = ckptr.restore(
      os.path.join(os.path.abspath(export_dir), VARIABLES_DIR))
  return config, state
