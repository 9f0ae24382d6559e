"""Rewrite a packed-table checkpoint between two mesh geometries.

Power-of-two meshes share one packed geometry by design (256-quantum
group rounding, ops/packed_table.py PackMeta) and restore directly; a
NON-power-of-two mesh (6-host pod, 12-device slice) quantizes its group
count differently, so its checkpoints are not interchangeable with
power-of-two ones (VERDICT r3 weak #8). This tool re-shards a packed
checkpoint to ANY target device count by decoding each combined table
with the geometry recorded in packed_layout.json, then re-encoding with
the exact metas a Trainer on the target mesh would build — weights AND
optimizer moments survive bit-exactly (compact bf16 pairs are decoded/
re-encoded losslessly).

Reference analog: the C++ mod-N re-sharding loader
(easy_rec/python/ops/src/load_kv_embed.cc:115-133) and
compat/embedding_parallel_saver.py:132-280.

Usage:
  python -m easyrec_tpu.tools.splice_packed_ckpt \
      --pipeline_config_path cfg.config \
      --ckpt_dir <model_dir with checkpoints/ + packed_layout.json> \
      --output_dir <new model_dir> --target_devices 6 [--step N]

Needs >= target_devices JAX devices to build the target trainer's mesh;
re-execs itself onto a virtual CPU mesh when the current backend has
fewer (so a single-chip host can splice for a 6-device pod).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import subprocess
import sys

import numpy as np


def _meta_from_stamp(tinfo: dict, compact: bool):
  """Reconstruct the WRITER's PackMeta from a packed_layout.json table
  entry (authoritative for on-disk geometry; the writer's logical row
  count padded per-topology but phys geometry is what's stored)."""
  from easyrec_tpu.ops.packed_table import PackMeta
  dim = int(tinfo['dim'])
  lp = int(tinfo['logical_parts'])
  probe = PackMeta(8, dim, lp, compact=compact and dim > 1)
  if probe.width != int(tinfo['width']):
    raise ValueError('stamp width %s does not match layout width %d '
                     '(layout generation changed?)'
                     % (tinfo['width'], probe.width))
  meta = PackMeta.__new__(PackMeta)
  meta.__dict__.update(probe.__dict__)
  meta.groups = int(tinfo['groups'])
  meta.phys_rows = int(tinfo['phys_rows'])
  meta.rows_padded = meta.groups * meta.group_rows
  # decode every padded row; the target meta decides how many live on
  meta.rows = meta.rows_padded
  return meta


def splice(pipeline_config_path: str, ckpt_dir: str, output_dir: str,
           target_devices: int, step: int = None) -> str:
  import jax
  from easyrec_tpu.config import get_configs_from_pipeline_file
  from easyrec_tpu.ops import packed_table as pt
  from easyrec_tpu.train import checkpoints as ckpt_lib
  from easyrec_tpu.train.restore import load_raw_checkpoint
  from easyrec_tpu.train.trainer import Trainer

  stamp_path = os.path.join(ckpt_dir, 'packed_layout.json')
  if not os.path.exists(stamp_path):
    raise FileNotFoundError(
        '%s has no packed_layout.json — not a packed checkpoint dir '
        '(plain checkpoints restore across any topology via orbax; no '
        'splice needed)' % ckpt_dir)
  with open(stamp_path) as f:
    stamp = json.load(f)
  if not stamp.get('packed'):
    raise ValueError('checkpoint is stamped plain-layout; no splice '
                     'needed')
  compact = bool(stamp.get('compact'))

  if jax.device_count() < target_devices:
    raise RuntimeError(
        'need >= %d devices to build the target mesh (have %d); run '
        'under XLA_FLAGS=--xla_force_host_platform_device_count=%d '
        'JAX_PLATFORMS=cpu' % (target_devices, jax.device_count(),
                               target_devices))

  cdir = os.path.join(ckpt_dir, 'checkpoints')
  if step is None:
    steps = sorted(int(d) for d in os.listdir(cdir) if d.isdigit())
    if not steps:
      raise FileNotFoundError('no checkpoints under %s' % cdir)
    step = steps[-1]
  raw = load_raw_checkpoint(os.path.join(cdir, str(step)))

  os.environ['EASYREC_PACKED_TABLES'] = '1'
  cfg = get_configs_from_pipeline_file(pipeline_config_path)
  trainer = Trainer(cfg, devices=jax.devices()[:target_devices])
  if not trainer.packed_mode:
    raise RuntimeError('target trainer did not select packed mode')
  tgt_metas = trainer.pack_metas

  new_tables = {}
  for name, arr in (raw.get('tables') or {}).items():
    arr = np.asarray(arr)
    tinfo = (stamp.get('tables') or {}).get(name)
    tgt = tgt_metas.get(name)
    if tinfo is None or tgt is None:
      logging.info('passing through table %r (no stamp/target meta)',
                   name)
      new_tables[name] = arr
      continue
    src = _meta_from_stamp(tinfo, compact)
    if arr.shape != (src.phys_rows, src.width):
      raise ValueError('table %r shape %s does not match its stamp %s'
                       % (name, arr.shape, (src.phys_rows, src.width)))
    if (src.groups, src.width) == (tgt.groups, tgt.width):
      new_tables[name] = arr          # geometry already matches
      continue
    w, slots = pt.unpack_host(arr, src)
    n = min(w.shape[0], tgt.rows)

    def fit(a):
      out = np.zeros((tgt.rows, a.shape[1]), a.dtype)
      out[:n] = a[:n]
      return out

    new_tables[name] = pt.pack_host(fit(w), [fit(s) for s in slots],
                                    tgt)
    logging.info('spliced %r: %d -> %d groups (%d live rows)', name,
                 src.groups, tgt.groups, n)

  spliced = dict(raw)
  spliced['tables'] = new_tables
  os.makedirs(output_dir, exist_ok=True)
  mgr = ckpt_lib.CheckpointManager(output_dir,
                                   layout_stamp=trainer.layout_stamp())
  mgr.save(spliced, step)
  mgr.close()
  return os.path.join(output_dir, 'checkpoints', str(step))


def main(argv=None):
  ap = argparse.ArgumentParser(description=__doc__)
  ap.add_argument('--pipeline_config_path', required=True)
  ap.add_argument('--ckpt_dir', required=True)
  ap.add_argument('--output_dir', required=True)
  ap.add_argument('--target_devices', type=int, required=True)
  ap.add_argument('--step', type=int, default=None)
  args = ap.parse_args(argv)

  # self re-exec onto a virtual CPU mesh when the current backend is
  # too small for the target (e.g. single-chip host splicing for a pod)
  if 'EASYREC_SPLICE_REEXEC' not in os.environ:
    import jax
    if jax.device_count() < args.target_devices:
      env = dict(os.environ)
      env['EASYREC_SPLICE_REEXEC'] = '1'
      env['JAX_PLATFORMS'] = 'cpu'
      env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                          ' --xla_force_host_platform_device_count=%d'
                          % args.target_devices).strip()
      sys.exit(subprocess.call([sys.executable, '-m',
                                'easyrec_tpu.tools.splice_packed_ckpt']
                               + (argv or sys.argv[1:]), env=env))
  out = splice(args.pipeline_config_path, args.ckpt_dir,
               args.output_dir, args.target_devices, args.step)
  print('spliced checkpoint at %s' % out)


if __name__ == '__main__':
  logging.basicConfig(level=logging.INFO)
  main()
