"""AOT compile-only validation of the MULTI-CHIP train step against a
TPU pod-slice topology — no pod required (VERDICT r2 missing #2).

Real multi-chip hardware has never executed the packed sharded path
(one chip here); what CAN be validated without a pod is the entire
lowering+compilation pipeline: shard_map over an 8-chip mesh, the
Mosaic group-DMA RMW kernel inside it, and the owner-routed
`lax.ragged_all_to_all` exchange — compiled by the real TPU compiler
for a v5e 2x4 topology description (jax.experimental.topologies AOT
flow). A check_vma rejection, Mosaic/shard_map incompatibility, or
ragged-a2a legalization failure — the classes of bug that killed the
r2 path before its fixes — fail HERE instead of at first pod contact.

Run (needs a TPU-capable compiler, e.g. the axon tunnel):
  python -m easyrec_tpu.tools.aot_pod_check [--topology v5e:2x4]

Exits 0 and prints per-chip memory analysis on success.
"""

from __future__ import annotations

import argparse
import os
import sys


def _abstractify(tree, topo_mesh):
  """Arrays (with CPU-mesh NamedShardings) -> ShapeDtypeStructs carrying
  the SAME specs transplanted onto the topology mesh."""
  import jax
  from jax.sharding import NamedSharding

  def one(x):
    spec = x.sharding.spec
    return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                sharding=NamedSharding(topo_mesh, spec))
  return jax.tree_util.tree_map(one, tree)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--topology', default='v5e:2x4',
                      help='jax topology name (v5e:2x4 = 8 chips)')
  parser.add_argument('--batch_per_chip', type=int, default=8)
  parser.add_argument('--num_slices', type=int, default=1,
                      help='multi-slice (DCN-connected) topology: the '
                           'mesh spans slices, XLA inserts cross-slice '
                           'collectives over DCN')
  args = parser.parse_args(argv)

  # the CPU half needs virtual devices BEFORE jax initializes
  plat = os.environ.get('JAX_PLATFORMS', '')
  if plat and 'cpu' not in plat.split(','):
    os.environ['JAX_PLATFORMS'] = plat + ',cpu'
  flags = os.environ.get('XLA_FLAGS', '')
  if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
  # packed layout ON for the CPU template trainer (auto would turn it
  # off on a CPU mesh) — the topology trainer picks it automatically
  os.environ['EASYREC_PACKED_TABLES'] = '1'

  import jax
  import numpy as np
  from jax.experimental import topologies

  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils.flagship import criteo_deepfm_config
  from easyrec_tpu.utils.synthetic import synthetic_batch

  kwargs = {'num_slices': args.num_slices} if args.num_slices > 1 else {}
  topo = topologies.get_topology_desc(platform='tpu',
                                      topology_name=args.topology,
                                      **kwargs)
  n = len(topo.devices)
  n_slices = len({getattr(d, 'slice_index', 0) for d in topo.devices})
  print('topology %s: %d chips over %d slice(s)'
        % (args.topology, n, n_slices))

  bs = args.batch_per_chip * n
  cfg = criteo_deepfm_config(batch_size=bs, hash_bucket_size=4096,
                             embedding_dim=16)

  # 1) template trainer on the virtual CPU mesh: concrete state + batch
  #    carry the shardings the real program uses. Pin default placement
  #    to CPU — loose constants otherwise land on the attached TPU
  #    backend, which this AOT flow must not touch at all.
  with jax.default_device(jax.devices('cpu')[0]):
    cpu_tr = Trainer(cfg, devices=jax.devices('cpu')[:n])
    assert cpu_tr.packed_mode
    batch = synthetic_batch(cpu_tr.specs, ['label'], bs, seed=0)
    state = cpu_tr.init_state(batch)
    sharded = cpu_tr.rules.shard_batch(batch)

  # 2) trainer over the TOPOLOGY devices: platform == 'tpu', so
  #    packed_mode + Mosaic kernel + real ragged-a2a are selected —
  #    exactly the pod program
  del os.environ['EASYREC_PACKED_TABLES']
  topo_tr = Trainer(cfg, devices=list(topo.devices))
  assert topo_tr.packed_mode, 'topology trainer must pick packed mode'
  assert topo_tr._packed_pallas, 'topology trainer must pick Mosaic'
  from easyrec_tpu.parallel import exchange
  assert exchange.exchange_mode(topo_tr.mesh) == 'a2a', \
      'topology mesh must select the real ragged_all_to_all'

  abs_state = _abstractify(state, topo_tr.mesh)
  abs_batch = _abstractify(sharded, topo_tr.mesh)

  lowered = topo_tr.train_step.lower(abs_state, abs_batch)
  hlo = lowered.as_text()
  # StableHLO spells these chlo.ragged_all_to_all / stablehlo.custom_call
  # @tpu_custom_call; post-optimization HLO spells them ragged-all-to-all
  # / custom-call ... tpu_custom_call — accept either stage's spelling
  checks = (
      (('ragged_all_to_all', 'ragged-all-to-all'),
       'owner-routed exchange'),
      (('tpu_custom_call',), 'Mosaic RMW kernel'),
  )
  for markers, what in checks:
    count = sum(hlo.count(m) for m in markers)
    assert count, 'expected %s (%s) in lowered HLO' % (markers, what)
    print('  %-24s x%d' % (what, count))
  print('lowering ok (%.1f MB HLO)' % (len(hlo) / 1e6))

  compiled = lowered.compile()
  mem = compiled.memory_analysis()
  if mem is not None:
    print('compile ok: argument %.2f MB, output %.2f MB, temp %.2f MB '
          'per chip' % (mem.argument_size_in_bytes / 1e6,
                        mem.output_size_in_bytes / 1e6,
                        mem.temp_size_in_bytes / 1e6))
  else:
    print('compile ok (no memory analysis available)')
  return 0


if __name__ == '__main__':
  sys.exit(main())
