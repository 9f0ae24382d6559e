"""Fine-tune (warm-start) partial restore with var-map renames, restore
filters and shape-compatible clip/pad.

Reference: easy_rec/python/model/easy_rec_model.py:219-351 (restore with
fine_tune_ckpt_var_map), utils/estimator_utils.py:669-750
(IncompatibleShapeRestoreHook), easy_rec_model.py:425-444 restore_filters.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _flatten(tree, prefix=()) -> Dict[str, Any]:
  out = {}
  for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
    keys = [str(p.key) for p in path if hasattr(p, 'key')]
    out['/'.join(keys)] = leaf
  return out


def _parse_var_map(var_map: str) -> Dict[str, str]:
  """'ckpt_name:model_name' lines or comma-separated pairs -> rename map
  applied to checkpoint names (reference var-map file semantics)."""
  mapping = {}
  if not var_map:
    return mapping
  if os.path.exists(var_map):
    with open(var_map) as f:
      content = f.read()
  else:
    content = var_map
  for entry in re.split(r'[,\n]', content):
    entry = entry.strip()
    if not entry:
      continue
    if ':' in entry:
      src, dst = entry.split(':', 1)
    elif '\t' in entry:
      src, dst = entry.split('\t', 1)
    else:
      continue
    mapping[src.strip()] = dst.strip()
  return mapping


def _fit_shape(value: np.ndarray, target_shape, name: str,
               force: bool) -> Optional[np.ndarray]:
  if tuple(value.shape) == tuple(target_shape):
    return value
  if not force:
    logging.warning('skip %s: ckpt shape %s != model shape %s '
                    '(set force_restore_shape_compatible to clip/pad)',
                    name, value.shape, target_shape)
    return None
  if value.ndim != len(target_shape):
    logging.warning('skip %s: rank mismatch %s vs %s', name, value.shape,
                    target_shape)
    return None
  # clip or zero-pad each axis (reference IncompatibleShapeRestoreHook)
  out = np.zeros(target_shape, dtype=value.dtype)
  slices = tuple(slice(0, min(a, b))
                 for a, b in zip(value.shape, target_shape))
  out[slices] = value[slices]
  logging.info('restored %s with shape adaptation %s -> %s', name,
               value.shape, target_shape)
  return out


def load_raw_checkpoint(ckpt_path: str):
  """Load a checkpoint as a raw pytree (no template). Accepts either a
  model_dir (picks the latest step), a .../checkpoints dir, or a direct
  step dir."""
  import orbax.checkpoint as ocp
  path = os.path.abspath(ckpt_path)
  cdir = os.path.join(path, 'checkpoints')
  if os.path.isdir(cdir):
    steps = sorted(int(d) for d in os.listdir(cdir) if d.isdigit())
    if not steps:
      raise FileNotFoundError('no checkpoints under %s' % cdir)
    path = os.path.join(cdir, str(steps[-1]))
  # CheckpointManager saves the pytree under the 'default' item
  if os.path.isdir(os.path.join(path, 'default')):
    path = os.path.join(path, 'default')
  with ocp.StandardCheckpointer() as ckptr:
    return ckptr.restore(path)


def fine_tune_restore(state, ckpt_path: str, var_map: str = '',
                      restore_filters: List[str] = (),
                      force_shape_compat: bool = True,
                      pack_metas=None):
  """Warm-start `state` from another run's checkpoint: params and
  embedding tables restored by matching flattened names; optimizer slots
  and step stay fresh.

  pack_metas: set when `state` holds PACKED tables (ops/packed_table.py);
  checkpointed tables in either layout are converted on host so plain
  checkpoints warm-start packed runs and vice versa."""
  raw = load_raw_checkpoint(ckpt_path)
  rename = _parse_var_map(var_map)
  filters = [re.compile(p) for p in restore_filters]

  if not pack_metas and raw.get('tables'):
    # the reverse direction: a PACKED checkpoint warm-starting a PLAIN
    # run. Detect combined [G*8, lcm(n_parts*dim,128)] shapes and unpack
    # the weights part — the generic shape-compat clip would otherwise
    # silently interpret interleaved optimizer slots as weights.
    from easyrec_tpu.ops import packed_table as pt
    cur_tables = jax.device_get(state.tables)
    fixed = {}
    for name, arr in raw['tables'].items():
      arr = np.asarray(arr)
      cur = cur_tables.get(name)
      if cur is not None and arr.ndim == 2 and \
          arr.shape[1] != cur.shape[1]:
        dim = int(cur.shape[1])
        # several n_parts can share one width (dim 16: 1 and 2 parts
        # both give W=128) — pick the candidate whose decoded capacity
        # is the smallest that still covers the current table (the
        # writer's quantized geometry for the same row count)
        candidates = []
        for n_parts in (1, 2, 3, 4):
          probe = pt.PackMeta(8, dim, n_parts)
          if arr.shape[1] != probe.width or arr.shape[0] % 8:
            continue
          meta = pt.PackMeta.__new__(pt.PackMeta)
          meta.__dict__.update(probe.__dict__)
          meta.groups = arr.shape[0] // 8
          meta.phys_rows = arr.shape[0]
          meta.rows_padded = meta.groups * meta.group_rows
          meta.rows = meta.rows_padded
          if meta.rows_padded >= cur.shape[0]:
            candidates.append((meta.rows_padded, n_parts, meta))
        if candidates:
          _, n_parts, meta = min(candidates)
          arr = pt.unpack_host(arr, meta)[0]
          logging.info('fine-tune restore: unpacked %s from the packed '
                       'combined layout (%d parts)', name, n_parts)
      fixed[name] = arr
    raw = dict(raw)
    raw['tables'] = fixed

  if pack_metas and raw.get('tables'):
    # warm-start a PACKED run from a plain (or exported) checkpoint:
    # splice the checkpointed weights into the current combined arrays,
    # keeping the state's freshly-initialized optimizer slot parts
    from easyrec_tpu.ops import packed_table as pt
    cur_tables = jax.device_get(state.tables)
    fixed = {}
    for name, arr in raw['tables'].items():
      arr = np.asarray(arr)
      meta = pack_metas.get(name)
      cur = cur_tables.get(name)
      if meta is not None and cur is not None and arr.ndim == 2 and \
          arr.shape[1] == meta.dim and arr.shape != cur.shape:
        _, cur_slots = pt.unpack_host(np.asarray(cur), meta)
        w = np.zeros((meta.rows, meta.dim), arr.dtype)
        w[:min(meta.rows, arr.shape[0])] = arr[:meta.rows]
        arr = pt.pack_host(w, cur_slots, meta)
      fixed[name] = arr
    raw = dict(raw)
    raw['tables'] = fixed

  def _restore_section(current, saved_section, section: str):
    cur_flat = _flatten(current)
    saved_flat = _flatten(saved_section) if saved_section is not None \
        else {}
    renamed = {}
    for name, value in saved_flat.items():
      renamed[rename.get(name, name)] = value
    updates = {}
    for name, cur in cur_flat.items():
      if name not in renamed:
        continue
      if any(f.search(name) for f in filters):
        logging.info('restore filter excluded %s/%s', section, name)
        continue
      fitted = _fit_shape(np.asarray(renamed[name]), cur.shape,
                          '%s/%s' % (section, name), force_shape_compat)
      if fitted is not None:
        updates[name] = fitted.astype(np.asarray(cur).dtype)
    if not updates:
      return current, 0

    def _replace(path, leaf):
      keys = [str(p.key) for p in path if hasattr(p, 'key')]
      name = '/'.join(keys)
      if name in updates:
        return jax.device_put(updates[name],
                              jax.sharding.get_sharding_spec(leaf)
                              if hasattr(jax.sharding,
                                         'get_sharding_spec') else
                              leaf.sharding)
      return leaf

    new = jax.tree_util.tree_map_with_path(_replace, current)
    return new, len(updates)

  new_params, n_params = _restore_section(state.params,
                                          raw.get('params'), 'params')
  new_tables, n_tables = _restore_section(state.tables,
                                          raw.get('tables'), 'tables')
  new_stats, n_stats = _restore_section(state.batch_stats,
                                        raw.get('batch_stats'),
                                        'batch_stats')
  logging.info('fine-tune restore from %s: %d params, %d tables, '
               '%d batch stats', ckpt_path, n_params, n_tables, n_stats)
  return state.replace(params=new_params, tables=new_tables,
                       batch_stats=new_stats)
