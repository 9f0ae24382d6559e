"""Driver API: train_and_evaluate / evaluate / predict / export.

Mirrors the reference driver (easy_rec/python/main.py:67-895): model-dir
guard, config save, version file, train loop with eval + exporters, offline
predict and serving export — re-expressed over the jitted Trainer.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Union

import jax
import numpy as np

from easyrec_tpu import __version__
from easyrec_tpu.config import config_util
from easyrec_tpu.protos import pipeline_pb2

ConfigOrPath = Union[str, pipeline_pb2.EasyRecConfig]


def _load(config: ConfigOrPath,
          edit_config_json: Optional[dict] = None
          ) -> pipeline_pb2.EasyRecConfig:
  if isinstance(config, str):
    config = config_util.get_configs_from_pipeline_file(config)
  else:
    clone = pipeline_pb2.EasyRecConfig()
    clone.CopyFrom(config)
    config = clone
  if edit_config_json:
    config_util.edit_config(config, edit_config_json)
  if config.fg_json_path:
    from easyrec_tpu.utils.fg_util import load_fg_json_to_config
    load_fg_json_to_config(config)
  return config


def _prepare_model_dir(config, continue_train: bool) -> None:
  model_dir = config.model_dir
  if not model_dir:
    return
  os.makedirs(model_dir, exist_ok=True)
  has_ckpt = os.path.isdir(os.path.join(model_dir, 'checkpoints'))
  if has_ckpt and not continue_train:
    logging.warning(
        'model_dir %s already contains checkpoints; training continues '
        'from the latest one (pass continue_train=True to silence)',
        model_dir)
  config_util.save_pipeline_config(config, model_dir)
  with open(os.path.join(model_dir, 'version'), 'w') as f:
    f.write(__version__ + '\n')


def train_and_evaluate(pipeline_config: ConfigOrPath,
                       continue_train: bool = False,
                       edit_config_json: Optional[dict] = None,
                       fit_on_eval: bool = False,
                       fit_on_eval_steps: int = 0,
                       devices=None,
                       check_mode: bool = False) -> Dict:
  """Train + final eval + export per export_config (reference main.py:273).

  fit_on_eval: after training completes, continue training on the EVAL
  data (reference main.py:377-398) — used to squeeze the freshest data in
  before export.
  """
  from easyrec_tpu.train.trainer import Trainer
  config = _load(pipeline_config, edit_config_json)
  _prepare_model_dir(config, continue_train)
  trainer = Trainer(config, devices=devices, check_mode=check_mode)
  result = trainer.fit()

  if fit_on_eval and config.WhichOneof('eval_path'):
    state = result['state']
    steps = 0
    logging.info('fit_on_eval: continuing training on eval data')
    for batch in trainer.eval_input(
        batch_size=config.data_config.batch_size):
      sharded = trainer.rules.shard_batch(batch)
      state, _ = trainer.train_step(state, sharded)
      steps += 1
      if fit_on_eval_steps and steps >= fit_on_eval_steps:
        break
    result['state'] = state
    result['global_step'] += steps
    logging.info('fit_on_eval: %d extra steps', steps)

  exporter_type = config.export_config.exporter_type or 'final'
  if exporter_type != 'none' and config.model_dir:
    from easyrec_tpu.export.saved_model import export_saved_model
    export_dir = export_saved_model(
        trainer, result['state'],
        os.path.join(config.model_dir, 'export', exporter_type),
        assets=list(config.export_config.asset_files))
    result['export_dir'] = export_dir
    logging.info('exported serving model to %s', export_dir)
  return result


def evaluate(pipeline_config: ConfigOrPath,
             eval_result_filename: str = 'eval_result.txt',
             edit_config_json: Optional[dict] = None,
             devices=None,
             check_mode: bool = False) -> Dict[str, float]:
  """Evaluate the latest checkpoint (reference main.py:403)."""
  from easyrec_tpu.train import checkpoints as ckpt_lib
  from easyrec_tpu.train.trainer import Trainer
  config = _load(pipeline_config, edit_config_json)
  trainer = Trainer(config, devices=devices, check_mode=check_mode)
  first = next(iter(trainer.eval_input()))
  state = trainer.init_state(first)
  mgr = ckpt_lib.CheckpointManager(config.model_dir,
                                 layout_stamp=trainer.layout_stamp())
  restored = mgr.restore_latest(state)
  if restored is None:
    raise FileNotFoundError('no checkpoint under %s' % config.model_dir)
  metrics = trainer.evaluate(restored)
  # multi-host: every process computes identical metrics (collectives);
  # only process 0 writes the result file (reference: master writes,
  # main.py:679-691)
  if jax.process_index() == 0:
    out_path = os.path.join(config.model_dir, eval_result_filename)
    with open(out_path, 'w') as f:
      json.dump({k: float(v) for k, v in metrics.items()}, f)
  logging.info('eval result: %s', metrics)
  return metrics


def distribute_evaluate(pipeline_config: ConfigOrPath, **kwargs):
  """Sharded eval: on TPU the jitted eval step already spreads batches over
  the mesh, so this is evaluate() (reference main.py:524 needed a
  multi-worker protocol; SPMD does not)."""
  return evaluate(pipeline_config, **kwargs)


def export(pipeline_config: ConfigOrPath,
           export_dir: Optional[str] = None,
           checkpoint_path: Optional[str] = None,
           edit_config_json: Optional[dict] = None,
           big_model: bool = False,
           devices=None) -> str:
  """Export serving model from the latest checkpoint (reference
  main.py:734); big_model strips embeddings into a file-backed KV store
  for memory-bounded serving (reference main.py:801-816 redis/OSS)."""
  from easyrec_tpu.export.saved_model import export_saved_model
  from easyrec_tpu.train import checkpoints as ckpt_lib
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.synthetic import synthetic_batch
  config = _load(pipeline_config, edit_config_json)
  trainer = Trainer(config, devices=devices)
  batch = synthetic_batch(trainer.specs, trainer.ctx.label_fields, 8)
  state = trainer.init_state(batch)
  mgr = ckpt_lib.CheckpointManager(config.model_dir,
                                 layout_stamp=trainer.layout_stamp())
  if checkpoint_path:
    step = int(os.path.basename(checkpoint_path))
    state = mgr.restore(step, state)
  else:
    restored = mgr.restore_latest(state)
    if restored is None:
      raise FileNotFoundError('no checkpoint under %s' % config.model_dir)
    state = restored
  base = export_dir or os.path.join(config.model_dir, 'export', 'final')
  return export_saved_model(trainer, state, base,
                            assets=list(config.export_config.asset_files),
                            big_model=big_model)


def predict(pipeline_config: ConfigOrPath,
            input_path: Optional[str] = None,
            output_path: Optional[str] = None,
            edit_config_json: Optional[dict] = None,
            devices=None):
  """Offline batch predict with the latest checkpoint
  (reference main.py:695). Returns list of output dicts when no
  output_path is given."""
  import jax
  from easyrec_tpu.train import checkpoints as ckpt_lib
  from easyrec_tpu.train.trainer import Trainer
  config = _load(pipeline_config, edit_config_json)
  trainer = Trainer(config, devices=devices)
  from easyrec_tpu.config import config_util as _cu
  input_path = input_path or _cu.get_eval_input_path(config)
  # predict mode: never splice sampled negatives into serving batches
  from easyrec_tpu.data.input_pipeline import InputPipeline
  pipe = InputPipeline(config.data_config, trainer.feature_configs,
                       input_path, mode='predict')
  first = next(iter(pipe))
  state = trainer.init_state(first)
  mgr = ckpt_lib.CheckpointManager(config.model_dir,
                                 layout_stamp=trainer.layout_stamp())
  restored = mgr.restore_latest(state)
  if restored is None:
    raise FileNotFoundError('no checkpoint under %s' % config.model_dir)
  state = restored

  from easyrec_tpu.ops import embedding as emb_ops
  layout, module, model = trainer.layout, trainer.module, trainer.model

  @jax.jit
  def predict_fn(state, batch):
    packs = emb_ops.pack_ids(layout, batch)
    pulled = emb_ops.pull_embeddings(state.tables, packs,
                                     trainer.pack_metas)
    variables = {'params': state.params}
    if state.batch_stats:
      variables['batch_stats'] = state.batch_stats
    outputs = module.apply(variables, batch, pulled, False)
    return model.export_outputs(outputs)

  rows = []
  for batch in pipe:
    valid = batch['sample_weight'] > 0
    res = jax.device_get(predict_fn(state, trainer.rules.shard_batch(batch)))
    keys = sorted(res)
    for i in np.nonzero(valid)[0]:
      rows.append({k: np.asarray(res[k])[i] for k in keys})
  if output_path:
    import csv as csv_lib
    with open(output_path, 'w', newline='') as f:
      writer = csv_lib.writer(f)
      keys = sorted(rows[0]) if rows else []
      writer.writerow(keys)
      for row in rows:
        writer.writerow([row[k] for k in keys])
  return rows
