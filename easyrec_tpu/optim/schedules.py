"""Learning-rate schedules as pure functions of the global step.

Parity with the reference schedules (easy_rec/python/core/
learning_schedules.py:25-220 and builders/optimizer_builder.py:147+),
expressed jit-safely in jnp.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from easyrec_tpu.protos import train_pb2


def build_schedule(lr_config: train_pb2.LearningRate,
                   default_lr: float = 0.001) -> Callable:
  """LearningRate proto -> fn(step) -> lr."""
  which = lr_config.WhichOneof('learning_rate') if lr_config is not None \
      else None
  if which is None:
    return lambda step: jnp.float32(default_lr)

  if which == 'constant_learning_rate':
    lr = lr_config.constant_learning_rate.learning_rate
    return lambda step: jnp.float32(lr)

  if which == 'exponential_decay_learning_rate':
    c = lr_config.exponential_decay_learning_rate
    def fn(step):
      step = step.astype(jnp.float32) if hasattr(step, 'astype') \
          else jnp.float32(step)
      exponent = step / c.decay_steps
      if c.staircase:
        exponent = jnp.floor(exponent)
      lr = c.initial_learning_rate * jnp.power(c.decay_factor, exponent)
      lr = jnp.maximum(lr, c.min_learning_rate)
      if c.burnin_steps > 0:
        # constant burn-in lr before the decay starts
        lr = jnp.where(step < c.burnin_steps,
                       jnp.float32(c.burnin_learning_rate or
                                   c.initial_learning_rate), lr)
      return lr
    return fn

  if which == 'cosine_decay_learning_rate':
    c = lr_config.cosine_decay_learning_rate
    def fn(step):
      step = jnp.asarray(step, jnp.float32)
      warmup = jnp.float32(c.warmup_steps)
      hold = jnp.float32(c.hold_base_rate_steps)
      total = jnp.float32(max(c.total_steps, 1))
      # linear warmup
      slope = (c.learning_rate_base - c.warmup_learning_rate) / \
          jnp.maximum(warmup, 1.0)
      warmup_lr = c.warmup_learning_rate + slope * step
      # cosine decay after warmup + hold
      progress = jnp.clip(
          (step - warmup - hold) / jnp.maximum(total - warmup - hold, 1.0),
          0.0, 1.0)
      cos_lr = 0.5 * c.learning_rate_base * (1 + jnp.cos(jnp.pi * progress))
      lr = jnp.where(step < warmup, warmup_lr,
                     jnp.where(step < warmup + hold,
                               jnp.float32(c.learning_rate_base), cos_lr))
      return lr
    return fn

  if which == 'manual_step_learning_rate':
    c = lr_config.manual_step_learning_rate
    boundaries = jnp.asarray([s.step for s in c.schedule], jnp.float32)
    rates = jnp.asarray(
        [c.initial_learning_rate] + [s.learning_rate for s in c.schedule],
        jnp.float32)
    def fn(step):
      step = jnp.asarray(step, jnp.float32)
      idx = jnp.sum((step >= boundaries).astype(jnp.int32))
      lr = rates[idx]
      if c.warmup and len(c.schedule) > 0:
        first_step = jnp.float32(c.schedule[0].step)
        frac = jnp.clip(step / jnp.maximum(first_step, 1.0), 0.0, 1.0)
        warm = c.initial_learning_rate + \
            (c.schedule[0].learning_rate - c.initial_learning_rate) * frac
        lr = jnp.where(step < first_step, warm, lr)
      return lr
    return fn

  if which == 'poly_decay_learning_rate':
    c = lr_config.poly_decay_learning_rate
    def fn(step):
      step = jnp.asarray(step, jnp.float32)
      frac = jnp.clip(step / jnp.float32(max(c.total_steps, 1)), 0.0, 1.0)
      return (c.learning_rate_base - c.end_learning_rate) * \
          jnp.power(1 - frac, c.power) + c.end_learning_rate
    return fn

  if which == 'transformer_learning_rate':
    c = lr_config.transformer_learning_rate
    def fn(step):
      step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0) * \
          c.step_scaling_rate
      hidden = jnp.float32(c.hidden_size)
      return c.learning_rate_base * jnp.power(hidden, -0.5) * \
          jnp.minimum(jnp.power(step, -0.5),
                      step * jnp.power(jnp.float32(c.warmup_steps), -1.5))
    return fn

  raise ValueError('unsupported learning rate schedule %s' % which)
