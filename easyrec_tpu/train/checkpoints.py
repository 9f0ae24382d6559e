"""Checkpoint management on top of orbax (sharded, async-capable).

Replaces the reference's Saver hooks + EmbeddingParallelSaver
(easy_rec/python/utils/estimator_utils.py:307-668,
compat/embedding_parallel_saver.py:46-317): orbax writes each array shard
from its owning host and handles topology changes on restore, so the
reference's C++ mod-N re-sharding loader (ops/src/load_kv_embed.cc) is
unnecessary.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
  """Thin wrapper over orbax CheckpointManager with keep-max semantics."""

  def __init__(self, directory: str, max_to_keep: int = 10):
    self.directory = os.path.abspath(directory)
    os.makedirs(self.directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False)
    self._mgr = ocp.CheckpointManager(
        os.path.join(self.directory, 'checkpoints'), options=options)

  def save(self, state: Any, step: int, force: bool = False) -> None:
    # a forced end-of-training save may land on the same step as the last
    # periodic save — orbax raises StepAlreadyExistsError on re-save
    if step in self._mgr.all_steps():
      return
    self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
    self._mgr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def restore_latest(self, template: Any) -> Optional[Any]:
    step = self._mgr.latest_step()
    if step is None:
      return None
    return self.restore(step, template)

  def restore(self, step: int, template: Any) -> Any:
    return self._mgr.restore(
        step, args=ocp.args.StandardRestore(template))

  def all_steps(self):
    return self._mgr.all_steps()

  def close(self):
    self._mgr.close()
