"""CLI teardown hygiene: exit_after must terminate even when a library
left a non-daemon thread running (the 40M-row proxy teardown hang,
PROXY_r05.json)."""

import subprocess
import sys
import time

SCRIPT = r"""
import threading, time
t = threading.Thread(target=lambda: time.sleep(120))
t.start()  # non-daemon: plain sys.exit would join this for 120 s
from easyrec_tpu.utils.proc import exit_after
exit_after(7)
"""


def test_exit_after_skips_shutdown_join():
  start = time.time()
  proc = subprocess.run(
      [sys.executable, '-c', SCRIPT], timeout=60,
      capture_output=True, text=True,
      env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
           'PYTHONPATH': '.'})
  elapsed = time.time() - start
  assert proc.returncode == 7
  assert elapsed < 30, elapsed
  assert 'non-daemon threads still alive' in proc.stderr
