"""Config + data pre-flight validation.

Reference: easy_rec/python/tools/pre_check.py + utils/check_utils.py
(check_mode validators). Checks, without training:
  - every feature's input_names exist in data_config.input_fields
  - every feature_group references declared features
  - label fields exist
  - model_class is registered and its required groups are present
  - a few batches actually parse (separator / type errors surface here)

  python -m easyrec_tpu.tools.pre_check --pipeline_config_path cfg
"""

from __future__ import annotations

import argparse
import logging
from typing import List


def check_config(pipeline_config) -> List[str]:
  """Returns a list of problems (empty = ok)."""
  from easyrec_tpu.config import config_util
  from easyrec_tpu.features import feature_spec as fs
  from easyrec_tpu.utils.registry import MODELS

  problems = []
  dc = pipeline_config.data_config
  input_names = {f.input_name for f in dc.input_fields}

  feature_configs = config_util.get_feature_configs(pipeline_config)
  feature_names = set()
  for fc in feature_configs:
    name = fc.feature_name or (fc.input_names[0] if fc.input_names else '?')
    feature_names.add(name)
    for n in fc.input_names:
      if n not in input_names:
        problems.append('feature %r reads input %r which is not in '
                        'data_config.input_fields' % (name, n))
    try:
      fs.build_feature_spec(fc)
    except Exception as e:
      problems.append('feature %r is invalid: %s' % (name, e))

  for label in dc.label_fields:
    if label not in input_names:
      problems.append('label field %r not in input_fields' % label)
  if dc.sample_weight and dc.sample_weight not in input_names:
    problems.append('sample_weight %r not in input_fields' %
                    dc.sample_weight)

  mc = pipeline_config.model_config
  from easyrec_tpu.models import zoo  # noqa: F401
  if mc.model_class not in MODELS:
    problems.append('unknown model_class %r (known: %s)' %
                    (mc.model_class, MODELS.keys()))
  for g in mc.feature_groups:
    for fname in g.feature_names:
      if fname not in feature_names:
        problems.append('feature group %r references unknown feature %r' %
                        (g.group_name, fname))
  problems.extend(_check_stacked_group_dims(mc, feature_configs))

  if not problems:
    # the embedding layout enforces group-level constraints (e.g. a deep
    # feature must have an embedding_dim) — build it to surface them
    try:
      from easyrec_tpu.models import base as model_base
      specs = {}
      for fc in feature_configs:
        spec = fs.build_feature_spec(fc)
        specs[spec.name] = spec
      model_base.build_context(pipeline_config, specs)
    except Exception as e:
      problems.append('model/feature layout invalid: %s' % e)
  return problems


# model_class -> groups whose stacked embeddings must share one dim
# (FM/attention/SENet field interactions run over a [B, F, D] stack).
# group None = the model's default group choice; kind 'categorical'
# means only embedding features participate in the stack.
_STACKED_GROUPS = {
    'DeepFM': [('deep', 'categorical')],
    'FM': [('deep', 'categorical')],
    'AutoInt': [(None, 'categorical')],
    'DLRM': [('sparse', 'categorical')],
    'DSSM_SENet': [('user', 'categorical'), ('item', 'categorical')],
    'CMBF': [('text', 'categorical')],
    'Uniter': [('text', 'categorical')],
}


def _check_stacked_group_dims(mc, feature_configs) -> List[str]:
  """Equal-embedding-dim validation for field-interaction models."""
  from easyrec_tpu.features import feature_spec as fs
  if mc.model_class not in _STACKED_GROUPS:
    return []
  specs = {}
  for fc in feature_configs:
    try:
      spec = fs.build_feature_spec(fc)
    except Exception:
      continue                          # reported by the caller already
    specs[spec.name] = spec
  groups = {g.group_name: list(g.feature_names)
            for g in mc.feature_groups}
  problems = []
  for group_name, kind in _STACKED_GROUPS[mc.model_class]:
    if group_name not in groups:
      if group_name is None or not groups:
        names = next(iter(groups.values()), [])
      else:
        continue                        # layout check reports it
    else:
      names = groups[group_name]
    dims = {}
    for n in names:
      spec = specs.get(n)
      if spec is not None and spec.kind == kind and spec.embedding_dim:
        dims.setdefault(int(spec.embedding_dim), []).append(n)
    if len(dims) > 1:
      problems.append(
          '%s stacks group %r for field interactions, which needs one '
          'shared embedding_dim, but got %s' %
          (mc.model_class, group_name or 'first',
           {d: v for d, v in sorted(dims.items())}))
  return problems


def check_data(pipeline_config, num_batches: int = 2) -> List[str]:
  """Parse a few real batches; surfaces separator / dtype issues."""
  problems = []
  try:
    from easyrec_tpu.config import config_util
    from easyrec_tpu.data.input_pipeline import InputPipeline
    pipe = InputPipeline(
        pipeline_config.data_config,
        config_util.get_feature_configs(pipeline_config),
        config_util.get_train_input_path(pipeline_config), mode='train')
    it = iter(pipe)
    import numpy as np
    for i in range(num_batches):
      batch = next(it, None)
      if batch is None:
        problems.append('training data exhausted after %d batches' % i)
        break
      for k, v in batch.items():
        arr = np.asarray(v)
        if arr.dtype.kind == 'f' and not np.isfinite(arr).all():
          problems.append('batch %d: column %r has non-finite values' %
                          (i, k))
  except Exception as e:
    problems.append('failed to read training data: %s' % e)
  return problems


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  parser = argparse.ArgumentParser()
  parser.add_argument('--pipeline_config_path', required=True)
  parser.add_argument('--data_batches', type=int, default=2)
  args = parser.parse_args(argv)
  from easyrec_tpu.config import config_util
  config = config_util.get_configs_from_pipeline_file(
      args.pipeline_config_path)
  problems = check_config(config)
  if not problems:
    problems += check_data(config, args.data_batches)
  if problems:
    for p in problems:
      logging.error('PRECHECK FAIL: %s', p)
    return 1
  logging.info('pre-check passed')
  return 0


if __name__ == '__main__':
  import sys
  sys.exit(main())
