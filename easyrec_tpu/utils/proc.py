"""Process-exit hygiene for CLI entry points.

The 40M-row proxy run (PROXY_r05.json) exposed a teardown hang: the
train_eval subprocess finished all work (eval_result.txt + export
written, exit code pending) but wedged in a thread join during
interpreter shutdown — a lingering non-daemon thread from a library
(jax compilation-cache writer / pyarrow IO pool class of problem), not
from easyrec_tpu code (all our threads are daemons).

`exit_after(code)` makes CLI completion unconditional: it flushes
stdio, gives cooperative threads a short grace window, logs the names
of any survivors so the owner can be identified from job logs, and
hard-exits via os._exit — skipping the interpreter's blocking
`threading._shutdown` join that caused the hang. Only used at the very
end of __main__ epilogues, after all results are on disk.
"""

from __future__ import annotations

import logging
import os
import sys
import threading
import time

_GRACE_S = 5.0


def exit_after(code: int) -> None:
  """Flush, reap cooperative threads, then hard-exit with `code`."""
  sys.stdout.flush()
  sys.stderr.flush()
  deadline = time.time() + _GRACE_S
  for t in threading.enumerate():
    if t is threading.current_thread() or t.daemon:
      continue
    t.join(timeout=max(0.0, deadline - time.time()))
  stragglers = [
      t.name for t in threading.enumerate()
      if t is not threading.current_thread() and not t.daemon
      and t.is_alive()
  ]
  if stragglers:
    logging.warning(
        'exiting with non-daemon threads still alive (hard os._exit to '
        'avoid a shutdown-join hang): %s', stragglers)
  sys.stdout.flush()
  sys.stderr.flush()
  os._exit(code)
