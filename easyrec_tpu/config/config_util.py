"""Pipeline-config loading, editing and saving.

Functional parity with the reference config system
(easy_rec/python/utils/config_util.py:46-620): text-format load with
``**`` glob expansion in input paths, a dotted-path config editor with type
conversion and array selectors, shared-feature expansion, auto input-field
expansion, and save/round-trip. The schema itself lives in
easyrec_tpu/protos/.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional, Union

from google.protobuf import descriptor
from google.protobuf import json_format
from google.protobuf import message as pb_message
from google.protobuf import text_format

from easyrec_tpu.protos import pipeline_pb2

EasyRecConfig = pipeline_pb2.EasyRecConfig


def get_configs_from_pipeline_file(path: str,
                                   auto_expand: bool = True) -> EasyRecConfig:
  """Load an EasyRecConfig from a text-format (or json) config file."""
  config = EasyRecConfig()
  with open(path, 'r') as f:
    content = f.read()
  if path.endswith('.json'):
    json_format.Parse(content, config, ignore_unknown_fields=True)
  else:
    # permissive parse: fields for features this build does not yet support
    # are ignored with a warning rather than failing the pipeline.
    try:
      text_format.Parse(content, config, allow_unknown_field=True)
    except text_format.ParseError:
      raise
  if auto_expand:
    auto_expand_share_feature_configs(config)
    auto_expand_input_fields(config)
    auto_expand_group_feature_names(config)
  return config


def get_configs_from_pipeline_str(content: str,
                                  auto_expand: bool = True) -> EasyRecConfig:
  """Parse an EasyRecConfig from a text-format string."""
  config = EasyRecConfig()
  text_format.Parse(content, config, allow_unknown_field=True)
  if auto_expand:
    auto_expand_share_feature_configs(config)
    auto_expand_input_fields(config)
    auto_expand_group_feature_names(config)
  return config


def save_pipeline_config(config: EasyRecConfig,
                         directory: str,
                         filename: str = 'pipeline.config') -> str:
  """Write config as text-format under directory (reference :161)."""
  os.makedirs(directory, exist_ok=True)
  path = os.path.join(directory, filename)
  with open(path, 'w') as f:
    f.write(text_format.MessageToString(config, as_utf8=True))
  return path


def save_message(message: pb_message.Message, path: str) -> None:
  os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
  with open(path, 'w') as f:
    f.write(text_format.MessageToString(message, as_utf8=True))


def get_feature_configs(config: EasyRecConfig):
  """Return the feature config list (either nested or legacy flat form)."""
  if config.feature_config.features:
    return list(config.feature_config.features)
  return list(config.feature_configs)


def auto_expand_share_feature_configs(config: EasyRecConfig) -> None:
  """Expand FeatureConfig.shared_names into standalone feature configs.

  Mirrors reference behavior (config_util.py:81-160): each name in
  shared_names becomes its own feature config sharing the embedding via
  embedding_name; glob-like numeric ranges ``name[1-5]`` are expanded.
  """
  for fc_list in (config.feature_configs, config.feature_config.features):
    extra = []
    for fc in fc_list:
      if not fc.shared_names:
        continue
      shared = []
      for name in fc.shared_names:
        shared.extend(_expand_range(name))
      # the shared features reuse the same embedding table
      if fc.embedding_dim > 0 and not fc.embedding_name:
        base = fc.feature_name or fc.input_names[0]
        fc.embedding_name = base + '_shared_embedding'
      for name in shared:
        clone = type(fc)()
        clone.CopyFrom(fc)
        clone.ClearField('shared_names')
        clone.ClearField('feature_name')
        del clone.input_names[:]
        clone.input_names.append(name)
        extra.append(clone)
      fc.ClearField('shared_names')
    fc_list.extend(extra)


def auto_expand_group_feature_names(config: EasyRecConfig) -> None:
  """Expand ``name[1-3]`` ranges inside feature_groups.feature_names
  (reference feature_column/feature_group.py:51 does this per-group,
  unconditionally)."""
  for group in config.model_config.feature_groups:
    if not any(_RANGE_RE.match(n) for n in group.feature_names):
      continue
    names = []
    for n in group.feature_names:
      names.extend(_expand_range(n))
    del group.feature_names[:]
    group.feature_names.extend(names)


def auto_expand_input_fields(config: EasyRecConfig) -> None:
  """Expand input field name ranges like f[1-10] when enabled."""
  if not config.data_config.auto_expand_input_fields:
    return
  fields = list(config.data_config.input_fields)
  del config.data_config.input_fields[:]
  for field in fields:
    names = _expand_range(field.input_name)
    for name in names:
      new_field = type(field)()
      new_field.CopyFrom(field)
      new_field.input_name = name
      config.data_config.input_fields.append(new_field)
  config.data_config.auto_expand_input_fields = False


_RANGE_RE = re.compile(r'^(.*)\[(\d+)-(\d+)\](.*)$')


def _expand_range(name: str):
  m = _RANGE_RE.match(name)
  if not m:
    return [name]
  prefix, lo, hi, suffix = m.group(1), int(m.group(2)), int(m.group(3)), \
      m.group(4)
  return ['%s%d%s' % (prefix, i, suffix) for i in range(lo, hi + 1)]


# ---------------------------------------------------------------------------
# dotted-path config editor (reference config_util.py:192-341)
# ---------------------------------------------------------------------------

_SELECTOR_RE = re.compile(r'^(?P<name>\w+)\[(?P<cond>.+)\]$')


def edit_config(config: pb_message.Message,
                edits: Union[str, Dict[str, Any]]) -> pb_message.Message:
  """Apply dotted-path edits to a config proto.

  Supports:
    - plain paths:      ``train_config.num_steps=100``
    - list index:       ``feature_configs[0].embedding_dim=32``
    - index range:      ``feature_configs[0:2].embedding_dim=32``
    - field predicate:  ``feature_configs[input_names[0]=field1].embedding_dim=32``
    - comparison:       ``feature_configs[embedding_dim>=16].combiner=mean``
  """
  if isinstance(edits, str):
    edits = json.loads(edits)
  for path, value in edits.items():
    parts = path.split('.')
    _apply_edit(config, parts, value)
  return config


def _apply_edit(msg, parts, value):
  targets = [msg]
  for i, part in enumerate(parts):
    is_last = (i == len(parts) - 1)
    new_targets = []
    for target in targets:
      sel = _SELECTOR_RE.match(part)
      if sel:
        name, cond = sel.group('name'), sel.group('cond')
        field_val = getattr(target, name)
        selected = _select(field_val, cond)
        if is_last:
          raise ValueError('cannot assign directly to selector %s' % part)
        new_targets.extend(selected)
      else:
        if is_last:
          _set_field(target, part, value)
        else:
          new_targets.append(getattr(target, part))
    targets = new_targets


def _select(repeated, cond):
  # numeric index or slice
  if re.match(r'^\d+$', cond):
    return [repeated[int(cond)]]
  m = re.match(r'^(\d*):(\d*)$', cond)
  if m:
    lo = int(m.group(1)) if m.group(1) else 0
    hi = int(m.group(2)) if m.group(2) else len(repeated)
    return list(repeated[lo:hi])
  # predicate: <fieldexpr><op><value>
  m = re.match(r'^([\w\[\]]+)\s*(>=|<=|!=|=|>|<)\s*(.*)$', cond)
  if not m:
    raise ValueError('bad selector condition: %s' % cond)
  fexpr, op, raw = m.group(1), m.group(2), m.group(3)
  out = []
  for item in repeated:
    val = _eval_field_expr(item, fexpr)
    ref = _convert_type(raw, type(val)) if val is not None else raw
    if _cmp(val, op, ref):
      out.append(item)
  return out


def _eval_field_expr(item, fexpr):
  m = _SELECTOR_RE.match(fexpr)
  if m:
    seq = getattr(item, m.group('name'))
    return seq[int(m.group('cond'))]
  return getattr(item, fexpr)


def _cmp(a, op, b):
  if op == '=':
    return a == b
  if op == '!=':
    return a != b
  if op == '>':
    return a > b
  if op == '<':
    return a < b
  if op == '>=':
    return a >= b
  if op == '<=':
    return a <= b
  raise ValueError(op)


def _convert_type(raw, target_type):
  if target_type is bool:
    if isinstance(raw, str):
      return raw.strip().lower() in ('true', '1', 'yes')
    return bool(raw)
  try:
    return target_type(raw)
  except (TypeError, ValueError):
    return raw


def _set_field(target, name, value):
  field = target.DESCRIPTOR.fields_by_name.get(name)
  if field is None:
    raise AttributeError('%s has no field %s' %
                         (target.DESCRIPTOR.name, name))
  if field.is_repeated:
    if isinstance(value, str):
      value = json.loads(value) if value.strip().startswith('[') \
          else value.split(',')
    if not isinstance(value, (list, tuple)):
      value = [value]
    del getattr(target, name)[:]
    if field.type == descriptor.FieldDescriptor.TYPE_MESSAGE:
      for v in value:
        if isinstance(v, dict):      # json array of objects
          json_format.ParseDict(v, getattr(target, name).add())
        else:
          text_format.Parse(v, getattr(target, name).add())
    else:
      py_type = _py_type(field)
      getattr(target, name).extend([_convert_type(v, py_type) for v in value])
  elif field.type == descriptor.FieldDescriptor.TYPE_MESSAGE:
    if isinstance(value, str):
      text_format.Parse(value, getattr(target, name))
    elif isinstance(value, dict):
      json_format.ParseDict(value, getattr(target, name))
    else:
      raise ValueError('cannot assign %r to message field %s' % (value, name))
  elif field.type == descriptor.FieldDescriptor.TYPE_ENUM:
    if isinstance(value, str):
      setattr(target, name, field.enum_type.values_by_name[value].number)
    else:
      setattr(target, name, int(value))
  else:
    setattr(target, name, _convert_type(value, _py_type(field)))


def _py_type(field):
  t = field.type
  F = descriptor.FieldDescriptor
  if t in (F.TYPE_INT32, F.TYPE_INT64, F.TYPE_UINT32, F.TYPE_UINT64,
           F.TYPE_SINT32, F.TYPE_SINT64, F.TYPE_FIXED32, F.TYPE_FIXED64,
           F.TYPE_SFIXED32, F.TYPE_SFIXED64):
    return int
  if t in (F.TYPE_FLOAT, F.TYPE_DOUBLE):
    return float
  if t == F.TYPE_BOOL:
    return bool
  return str


# ---------------------------------------------------------------------------
# train/eval path helpers (reference config_util.py:457-540)
# ---------------------------------------------------------------------------


def get_train_input_path(config: EasyRecConfig) -> Optional[str]:
  which = config.WhichOneof('train_path')
  if which is None:
    return None
  # string paths for file inputs; message configs (kafka/datahub/hive)
  # are returned as their proto message
  return getattr(config, which)


def set_train_input_path(config: EasyRecConfig, path: str) -> None:
  config.train_input_path = path


def get_eval_input_path(config: EasyRecConfig) -> Optional[str]:
  which = config.WhichOneof('eval_path')
  if which is None:
    return None
  return getattr(config, which)


def set_eval_input_path(config: EasyRecConfig, path: str) -> None:
  config.eval_input_path = path


def expand_input_paths(pattern: Union[str, list]) -> list:
  """Expand comma-separated path patterns with glob (incl ``**``)."""
  import glob as _glob
  if isinstance(pattern, str):
    patterns = [p for p in pattern.split(',') if p]
  else:
    patterns = list(pattern)
  paths = []
  for p in patterns:
    if any(ch in p for ch in '*?['):
      matched = sorted(_glob.glob(p, recursive=True))
      if not matched:
        logging.warning('input pattern %s matched no files', p)
      paths.extend(matched)
    else:
      paths.append(p)
  return paths


def process_neg_sampler_data_path(config: EasyRecConfig) -> None:
  """Normalize negative-sampler input paths (reference :552)."""
  dc = config.data_config
  which = dc.WhichOneof('sampler')
  if not which:
    return
  sampler = getattr(dc, which)
  for field in ('input_path', 'user_input_path', 'item_input_path',
                'pos_edge_input_path', 'hard_neg_edge_input_path'):
    if sampler.DESCRIPTOR.fields_by_name.get(field) and \
        getattr(sampler, field, ''):
      setattr(sampler, field, getattr(sampler, field).strip())


def collect_extra_fields(config: EasyRecConfig) -> list:
  """Input fields that must ride along in batches as 'field.<name>'
  columns: metric grouping ids (GAUC uid / session AUC), loss
  session_name fields, and KD teacher-prediction / soft-label fields
  (reference keeps these via effective-field selection,
  input/input.py:144-175)."""
  fields = []

  def _add(name):
    if name and name not in fields:
      fields.append(name)

  def _metric_fields(metrics_set):
    for m in metrics_set:
      which = m.WhichOneof('metric')
      if which == 'gauc':
        _add(m.gauc.uid_field)
      elif which == 'session_auc':
        _add(m.session_auc.session_id_field)

  _metric_fields(config.eval_config.metrics_set)
  mc = config.model_config
  for loss in mc.losses:
    which = loss.WhichOneof('loss_param')
    if which is not None:
      params = getattr(loss, which)
      if 'session_name' in {f.name for f in params.DESCRIPTOR.fields}:
        _add(params.session_name)
  for kd in mc.kd:
    _add(kd.pred_name)
    _add(kd.soft_label_name)
    _add(kd.task_space_indicator_name)
  which_model = mc.WhichOneof('model')
  if which_model is not None:
    sub = getattr(mc, which_model)
    sub_fields = {f.name for f in sub.DESCRIPTOR.fields}
    for tower_field in ('task_towers',):
      if tower_field in sub_fields:
        for tower in getattr(sub, tower_field):
          _metric_fields(tower.metrics_set)
          _add(tower.task_space_indicator_name)
    # metric-learning grouping ids
    for name_field in ('session_id', 'sample_id'):
      if name_field in sub_fields:
        _add(getattr(sub, name_field))
  # drop names that are already labels (those flow as label.<name>)
  labels = set(config.data_config.label_fields)
  return [f for f in fields if f not in labels]
