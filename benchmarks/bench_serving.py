"""Serving latency/QPS benchmark (VERDICT r4 next-step 5).

Trains a small DeepFM-style model on the learnable synthetic fixture,
exports it, starts the HTTP server (warmup-before-bind), then measures
warm request latency over HTTP:

  - single-row POST /predict     -> p50 / p99 latency, QPS
  - batch-256 POST /predict      -> p50 / p99 latency, rows/s

Run on one chip: python benchmarks/bench_serving.py
(CPU works too — numbers are then CPU serving numbers.)

Results land in docs/serving.md's benchmark table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

N_SINGLE = 300
N_BATCH = 60
BATCH = 256


def _post(url, obj):
  req = urllib.request.Request(
      url, data=json.dumps(obj).encode(),
      headers={'Content-Type': 'application/json'})
  with urllib.request.urlopen(req) as r:
    return json.loads(r.read())


def make_export(work: str) -> str:
  from tests import fixtures
  from easyrec_tpu import main as er_main
  from easyrec_tpu.config import get_configs_from_pipeline_file
  os.makedirs(work, exist_ok=True)
  cfg_path = fixtures.write_pipeline(work, num_steps=200)
  cfg = get_configs_from_pipeline_file(cfg_path)
  res = er_main.train_and_evaluate(cfg)
  return res['export_dir']


def pct(xs, q):
  return float(np.percentile(np.asarray(xs), q))


def main():
  from easyrec_tpu.serving.server import PredictorService
  work = os.environ.get('BENCH_SERVING_DIR', '/tmp/bench_serving')
  export_dir = make_export(work)

  service = PredictorService(export_dir, batch_size=BATCH)
  t0 = time.time()
  url = service.start()                # includes warmup
  startup = time.time() - t0
  hz = json.loads(urllib.request.urlopen(url + '/healthz').read())
  assert hz['status'] == 'warm', hz

  row = {'d1': 0.3, 'd2': 0.7, 'c1': 'a17', 'c2': 'b5', 'c3': 'c99'}

  # single-row latency
  for _ in range(20):                  # settle
    _post(url + '/predict', {'inputs': [row]})
  lat1 = []
  for _ in range(N_SINGLE):
    t = time.perf_counter()
    _post(url + '/predict', {'inputs': [row]})
    lat1.append((time.perf_counter() - t) * 1e3)

  # batch-256 latency
  batch_rows = [dict(row, d1=float(i % 100) / 100) for i in range(BATCH)]
  for _ in range(5):
    _post(url + '/predict', {'inputs': batch_rows})
  latb = []
  for _ in range(N_BATCH):
    t = time.perf_counter()
    _post(url + '/predict', {'inputs': batch_rows})
    latb.append((time.perf_counter() - t) * 1e3)

  service.stop()
  out = {
      'metric': 'serving_latency',
      'backend': os.environ.get('JAX_PLATFORMS', 'default'),
      'startup_incl_warmup_s': round(startup, 2),
      'single_row_ms': {'p50': round(pct(lat1, 50), 2),
                        'p99': round(pct(lat1, 99), 2)},
      'single_row_qps': round(1000.0 / pct(lat1, 50), 1),
      'batch256_ms': {'p50': round(pct(latb, 50), 2),
                      'p99': round(pct(latb, 99), 2)},
      'batch256_rows_per_s': round(BATCH * 1000.0 / pct(latb, 50), 1),
  }
  print(json.dumps(out))


if __name__ == '__main__':
  main()
