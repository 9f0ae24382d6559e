#!/usr/bin/env python
"""Suite runner with documented lanes (VERDICT r3 next-step 3; the
reference's parallel subprocess runner is test/run.py --num_parallel).

  python tests/run.py --pre-commit   # skips the 'slow' convergence
                                     # gates; target < 15 min
  python tests/run.py --full         # everything (driver/judge lane)

Parallelism: shards across cores via pytest-xdist when the host has
more than one (THIS box exposes a single core — the reference's
--num_parallel 10 assumes a multi-core dev host; on one core the full
suite is training-bound at ~45-60 min with a warm compile cache).
The persistent XLA compile cache (tests/conftest.py) makes second runs
skip recompilation; the first run on a fresh host is ~30% slower.
"""

import argparse
import os
import subprocess
import sys


def main():
  ap = argparse.ArgumentParser()
  lane = ap.add_mutually_exclusive_group()
  lane.add_argument('--pre-commit', action='store_true')
  lane.add_argument('--full', action='store_true')
  ap.add_argument('--jobs', type=int, default=0,
                  help='worker processes (default: cores, capped)')
  args, extra = ap.parse_known_args()

  cmd = [sys.executable, '-m', 'pytest',
         os.path.dirname(os.path.abspath(__file__)), '-q']
  if args.pre_commit:
    cmd += ['-m', 'not slow']
  cores = os.cpu_count() or 1
  jobs = args.jobs or cores
  if jobs > 1:
    try:
      import xdist  # noqa: F401
      cmd += ['-n', str(jobs)]
    except ImportError:
      pass
  cmd += extra
  print('+', ' '.join(cmd), flush=True)
  return subprocess.call(cmd)


if __name__ == '__main__':
  sys.exit(main())
