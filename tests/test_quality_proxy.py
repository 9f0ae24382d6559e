"""Smoke-level plumbing test for the calibrated quality proxy
(benchmarks/quality_proxy.py): generator calibration hits the anchor,
the corpus round-trips the real pipeline, and both implementations
produce finite AUCs. Full-scale results are measured out-of-band and
recorded in PERF.md (r4: the proxy caught the 100x embedding-init
bug)."""

import json
import subprocess
import sys

import numpy as np
import pytest


def test_generator_calibration_and_bayes_auc():
  from benchmarks.quality_proxy import (GroundTruth, _auc, calibrate,
                                        TARGET_BAYES_AUC, TARGET_CTR)
  scale, bias = calibrate(n=60000)
  gt = GroundTruth(7, scale=scale, bias=bias)
  r = np.random.default_rng(5)
  ids, nums, y, p = gt.sample(r, 40000)
  bayes = _auc(y, p)
  assert abs(bayes - TARGET_BAYES_AUC) < 0.01, bayes
  assert abs(float(y.mean()) - TARGET_CTR) < 0.02


def test_auc_implementation_matches_sklearn_style():
  # rank-sum AUC vs a direct pairwise count on a tiny sample
  from benchmarks.quality_proxy import _auc
  rng = np.random.default_rng(0)
  y = rng.integers(0, 2, 200)
  s = rng.normal(size=200)
  pos, neg = s[y == 1], s[y == 0]
  direct = float(((pos[:, None] > neg[None, :]).sum() +
                  0.5 * (pos[:, None] == neg[None, :]).sum()) /
                 (len(pos) * len(neg)))
  assert abs(_auc(y, s) - direct) < 1e-12


@pytest.mark.slow
def test_proxy_smoke_end_to_end(tmp_path):
  """--smoke: tiny corpus through BOTH implementations; asserts the
  harness runs end-to-end and emits the verdict line (AUCs at 30 steps
  are informational only)."""
  out = subprocess.run(
      [sys.executable, 'benchmarks/quality_proxy.py', '--smoke',
       '--skip_ab',    # ONE easyrec variant: the A/B matrix is a
                       # full-scale measurement, not suite material
       '--work_dir', str(tmp_path)],
      capture_output=True, text=True, cwd='/root/repo', timeout=1500)
  lines = [line for line in out.stdout.splitlines()
           if line.startswith('{')]
  cases = {json.loads(line)['case']: json.loads(line) for line in lines}
  assert 'bayes_anchor' in cases and 'verdict' in cases, out.stdout
  assert 'torch_ref' in cases
  assert cases['verdict']['ok'], cases
