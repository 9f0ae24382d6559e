"""Analytical multi-chip scaling model from AOT-compiled HLO
(VERDICT r4 next-step 6).

Real multi-chip hardware is unavailable here; the strongest available
evidence for SCALING (not just correctness) is the compiler's own
program: AOT-lower the flagship train step for several pod-slice
topologies, extract every cross-chip collective and its payload bytes
from the optimized HLO, and combine those wire bytes with the
single-chip stage times measured on real v5e (PERF.md r5) under
published bandwidth assumptions.

  python -m easyrec_tpu.tools.scaling_model \
      [--topologies v5e:2x4,v5e:4x4,v5e:4x8] [--batch_per_chip 4096]

Output: one JSON line per topology with per-chip collective byte
counts + a projected step time / examples-per-sec-per-chip table.
docs/pod_checklist.md records the resulting model and its assumptions.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

# -- published-spec assumptions (documented, overridable) ---------------
# v5e: 819 GB/s HBM; ICI 1600 Gbps aggregate per chip across 4 links
# => ~200 GB/s raw, ~45 GB/s effective per-direction per link pair for
# all-to-all traffic patterns (scaling-book style derate); DCN per host
# ~ 25 GB/s shared by its 8 chips.
ICI_EFF_BPS = float(os.environ.get('SCALING_ICI_BPS', 45e9))
DCN_EFF_BPS_PER_CHIP = float(os.environ.get('SCALING_DCN_BPS', 3.1e9))
# measured single-chip flagship stage split at batch 4096 (PERF.md r5
# in-step ablation): base fwd+bwd+dense 4.27 ms, prep 3.29 ms, RMW
# kernel + wide 6.86 ms => 14.42 ms/step
MEASURED_STEP_MS = {'base': 4.27, 'prep': 3.29, 'kernel': 6.86}

_SHAPE_RE = re.compile(r'([a-z]+\d+)\[([\d,]*)\]')
_DTYPE_BYTES = {'f32': 4, 'bf16': 2, 's32': 4, 'u32': 4, 'f16': 2,
                's64': 8, 'u64': 8, 'pred': 1, 's8': 1, 'u8': 1,
                's16': 2, 'u16': 2}

COLLECTIVES = ('ragged-all-to-all', 'all-to-all', 'all-reduce',
               'all-gather', 'reduce-scatter', 'collective-permute')


def _op_bytes(line: str) -> int:
  """Result payload bytes of one HLO op line (first shape = result)."""
  m = _SHAPE_RE.search(line)
  if not m:
    return 0
  dt, dims = m.group(1), m.group(2)
  n = 1
  for d in dims.split(','):
    if d:
      n *= int(d)
  return n * _DTYPE_BYTES.get(dt, 4)


def analyze_hlo(hlo: str, n_chips: int):
  """Per-chip per-step wire bytes by collective kind.

  HLO shapes are PER-PARTICIPANT under SPMD partitioning, so the result
  payload of a collective is already the per-chip tensor; for
  all-gather the per-chip WIRE traffic is ~result bytes (it receives
  the full gathered tensor), for all-reduce ~2x input bytes
  (reduce-scatter + all-gather lowering), for (ragged-)all-to-all the
  per-chip send+recv is ~2x the buffer."""
  counts = {}
  wire = {}
  for line in hlo.splitlines():
    s = line.strip()
    m = re.search(r'= [a-z0-9\[\],() ]*?(%s)' % '|'.join(COLLECTIVES), s)
    kind = None
    for c in COLLECTIVES:
      if (' %s(' % c) in s or ('%s(' % c) in s.split('=')[-1][:40]:
        kind = c
        break
    if kind is None:
      continue
    b = _op_bytes(s.split('=', 1)[-1])
    counts[kind] = counts.get(kind, 0) + 1
    factor = {'all-reduce': 2.0, 'ragged-all-to-all': 2.0,
              'all-to-all': 2.0}.get(kind, 1.0)
    wire[kind] = wire.get(kind, 0) + int(b * factor)
  return counts, wire


def project(wire: dict, n_slices: int):
  """Projected step time: measured single-chip compute + wire bytes
  over ICI (or DCN for the cross-slice share)."""
  total_bytes = sum(wire.values())
  if n_slices > 1:
    # mesh spans slices: conservatively price 1/n_slices of collective
    # traffic at DCN bandwidth (the cross-slice share of a ring)
    cross = total_bytes / n_slices
    comm_s = (total_bytes - cross) / ICI_EFF_BPS + \
        cross / DCN_EFF_BPS_PER_CHIP
  else:
    comm_s = total_bytes / ICI_EFF_BPS
  compute_ms = sum(MEASURED_STEP_MS.values())
  # the exchange overlaps poorly with the DMA-issue-bound kernel
  # (scalar core busy) — model as additive (conservative)
  step_ms = compute_ms + comm_s * 1e3
  return step_ms, comm_s * 1e3


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--topologies',
                      default='v5e:2x4,v5e:4x4,v5e:4x8')
  parser.add_argument('--num_slices', type=int, default=1)
  parser.add_argument('--batch_per_chip', type=int, default=4096)
  # table SIZE does not change per-chip exchange bytes (wire bytes ~
  # ids/batch x dim, independent of rows — PERF.md r2 EP notes), so the
  # AOT template uses a small table like aot_pod_check; the measured
  # single-chip stage times supply the full-size compute cost
  parser.add_argument('--hash_buckets', type=int, default=4096)
  parser.add_argument('--compile', action='store_true',
                      help='also run full backend compile (slower)')
  args = parser.parse_args(argv)

  plat = os.environ.get('JAX_PLATFORMS', '')
  if plat and 'cpu' not in plat.split(','):
    os.environ['JAX_PLATFORMS'] = plat + ',cpu'
  # the CPU template trainer needs as many virtual devices as the
  # LARGEST requested topology (packed tables pad rows by shard count,
  # so template and topology geometries must match)
  sizes = {8: 8}
  for t in args.topologies.split(','):
    dims = t.split(':')[1]
    n = 1
    for d in dims.split('x'):
      n *= int(d)
    sizes[n * max(1, args.num_slices)] = True
  max_dev = max(sizes)
  flags = os.environ.get('XLA_FLAGS', '')
  if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=%d'
        % max_dev).strip()
  os.environ['EASYREC_PACKED_TABLES'] = '1'

  import jax
  from jax.experimental import topologies

  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.flagship import criteo_deepfm_config
  from easyrec_tpu.utils.synthetic import synthetic_batch
  from easyrec_tpu.tools.aot_pod_check import _abstractify

  results = []
  for topo_name in args.topologies.split(','):
    kwargs = {'num_slices': args.num_slices} if args.num_slices > 1 \
        else {}
    topo = topologies.get_topology_desc(
        platform='tpu', topology_name=topo_name.strip(), **kwargs)
    n = len(topo.devices)
    n_slices = len({getattr(d, 'slice_index', 0) for d in topo.devices})
    bs = args.batch_per_chip * n

    os.environ['EASYREC_PACKED_TABLES'] = '1'
    cfg = criteo_deepfm_config(batch_size=bs,
                               hash_bucket_size=args.hash_buckets)
    # CPU template at the SAME device count: packed-table geometry
    # (shard-padded rows) must match the topology trainer's
    with jax.default_device(jax.devices('cpu')[0]):
      cpu_tr = Trainer(cfg, devices=jax.devices('cpu')[:n])
      batch = synthetic_batch(cpu_tr.specs, ['label'], bs, seed=0)
      state = cpu_tr.init_state(batch)
      sharded = cpu_tr.rules.shard_batch(batch)
    del os.environ['EASYREC_PACKED_TABLES']
    topo_tr = Trainer(cfg, devices=list(topo.devices))
    abs_state = _abstractify(state, topo_tr.mesh)
    abs_batch = _abstractify(sharded, topo_tr.mesh)
    lowered = topo_tr.train_step.lower(abs_state, abs_batch)
    if args.compile:
      hlo = lowered.compile().as_text()
    else:
      hlo = lowered.as_text()
    counts, wire = analyze_hlo(hlo, n)
    step_ms, comm_ms = project(wire, n_slices)
    rec = {
        'topology': topo_name.strip(), 'chips': n, 'slices': n_slices,
        'batch_per_chip': args.batch_per_chip,
        'collective_counts': counts,
        'wire_bytes_per_chip': wire,
        'wire_mb_per_chip_per_step': round(sum(wire.values()) / 1e6, 2),
        'projected_comm_ms': round(comm_ms, 2),
        'projected_step_ms': round(step_ms, 2),
        'projected_ex_s_per_chip': round(
            args.batch_per_chip / step_ms * 1e3, 1),
        'assumptions': {'ici_eff_bps': ICI_EFF_BPS,
                        'dcn_eff_bps_per_chip': DCN_EFF_BPS_PER_CHIP,
                        'measured_single_chip_ms': MEASURED_STEP_MS},
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)
  return 0


if __name__ == '__main__':
  sys.exit(main())
