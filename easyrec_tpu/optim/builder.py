"""Optimizer construction from the Optimizer proto.

Each configured optimizer produces a PAIR: an optax transform for the dense
tower parameters and a row-sparse twin for the embedding tables, driven by
the same schedule. Multi-optimizer configs follow the reference grouping
(easy_rec/python/model/easy_rec_model.py:446-467): first optimizer ->
embedding/sparse vars, second -> dense vars.
Reference builder: easy_rec/python/builders/optimizer_builder.py:28-145.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from easyrec_tpu.optim import schedules
from easyrec_tpu.optim import sparse as sparse_lib
from easyrec_tpu.protos import train_pb2


@dataclasses.dataclass
class OptimizerPair:
  dense: optax.GradientTransformation
  sparse: sparse_lib.SparseOptimizer
  schedule: Callable
  embedding_lr_multiplier: float = 1.0


def _dense_from_config(which: str, cfg, schedule) -> \
    optax.GradientTransformation:
  if which in ('adam_optimizer', 'adam_async_optimizer',
               'lazy_adam_optimizer'):
    return optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2)
  if which in ('adamw_optimizer', 'adam_asyncw_optimizer'):
    return optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                       weight_decay=cfg.weight_decay)
  if which == 'adagrad_optimizer':
    return optax.adagrad(
        schedule, initial_accumulator_value=cfg.initial_accumulator_value)
  if which == 'momentum_optimizer':
    return optax.sgd(schedule, momentum=cfg.momentum_optimizer_value)
  if which == 'momentumw_optimizer':
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(schedule, momentum=cfg.momentum_optimizer_value))
  if which == 'rms_prop_optimizer':
    return optax.rmsprop(schedule, decay=cfg.decay, eps=cfg.epsilon,
                         momentum=cfg.momentum_optimizer_value)
  if which == 'ftrl_optimizer':
    # optax has no ftrl; adagrad is the closest accumulator-style transform
    return optax.adagrad(
        schedule, initial_accumulator_value=cfg.initial_accumulator_value)
  raise ValueError('unsupported optimizer %s' % which)


def _sparse_from_config(which: str, cfg) -> sparse_lib.SparseOptimizer:
  if which in ('adam_optimizer', 'adam_async_optimizer',
               'lazy_adam_optimizer'):
    return sparse_lib.sparse_adam(b1=cfg.beta1, b2=cfg.beta2)
  if which in ('adamw_optimizer', 'adam_asyncw_optimizer'):
    return sparse_lib.sparse_adam(b1=cfg.beta1, b2=cfg.beta2,
                                  weight_decay=cfg.weight_decay)
  if which == 'adagrad_optimizer':
    return sparse_lib.sparse_adagrad(
        initial_accumulator=cfg.initial_accumulator_value)
  if which == 'momentum_optimizer':
    return sparse_lib.sparse_momentum(momentum=cfg.momentum_optimizer_value)
  if which == 'momentumw_optimizer':
    return sparse_lib.sparse_momentum(momentum=cfg.momentum_optimizer_value)
  if which == 'rms_prop_optimizer':
    return sparse_lib.sparse_adagrad()
  if which == 'ftrl_optimizer':
    return sparse_lib.sparse_ftrl(
        learning_rate_power=cfg.learning_rate_power,
        initial_accumulator=cfg.initial_accumulator_value,
        l1=cfg.l1_reg, l2=cfg.l2_reg,
        l2_shrinkage=cfg.l2_shrinkage_reg)
  raise ValueError('unsupported optimizer %s' % which)


class ParamEmaState(NamedTuple):
  ema: object


def param_ema(decay: float) -> optax.GradientTransformation:
  """Track an exponential moving average of the POST-update params
  (reference Optimizer.use_moving_average / moving_average_decay:
  tf.train.ExponentialMovingAverage applied after optimize_loss).
  The EMA rides in the optimizer state; eval/export reads it via
  Trainer.eval_params."""

  def init_fn(params):
    return ParamEmaState(ema=jax.tree_util.tree_map(jnp.asarray, params))

  def update_fn(updates, state, params=None):
    new_p = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    ema = jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_p)
    return updates, ParamEmaState(ema=ema)

  return optax.GradientTransformation(init_fn, update_fn)


def find_param_ema(opt_state):
  """Return the EMA param tree from an optax state, or None."""
  for leaf in jax.tree_util.tree_leaves(
      opt_state, is_leaf=lambda x: isinstance(x, ParamEmaState)):
    if isinstance(leaf, ParamEmaState):
      return leaf.ema
  return None


def build_optimizer(opt_config: train_pb2.Optimizer,
                    clip_norm: float = 0.0) -> OptimizerPair:
  which = opt_config.WhichOneof('optimizer')
  if which is None:
    which = 'adam_optimizer'
    cfg = opt_config.adam_optimizer
  else:
    cfg = getattr(opt_config, which)
  schedule = schedules.build_schedule(
      cfg.learning_rate if cfg.HasField('learning_rate') else None)
  dense = _dense_from_config(which, cfg, schedule)
  if clip_norm and clip_norm > 0:
    dense = optax.chain(optax.clip_by_global_norm(clip_norm), dense)
  if opt_config.use_moving_average:
    dense = optax.chain(dense,
                        param_ema(float(opt_config.moving_average_decay)))
  sparse = _sparse_from_config(which, cfg)
  mult = opt_config.embedding_learning_rate_multiplier \
      if opt_config.HasField('embedding_learning_rate_multiplier') else 1.0
  return OptimizerPair(dense=dense, sparse=sparse, schedule=schedule,
                       embedding_lr_multiplier=mult)


def build_optimizers(train_config: train_pb2.TrainConfig) -> \
    Tuple[OptimizerPair, Optional[OptimizerPair]]:
  """Returns (primary, embedding_override).

  With one configured optimizer both dense and sparse params use it. With
  two, the FIRST drives the embedding tables and the SECOND the dense
  params (reference multi-optimizer grouping, easy_rec_model.py:446-467).
  """
  opts = list(train_config.optimizer_config)
  clip = train_config.gradient_clipping_by_norm
  if not opts:
    return build_optimizer(train_pb2.Optimizer(), clip), None
  if len(opts) == 1:
    return build_optimizer(opts[0], clip), None
  embed_pair = build_optimizer(opts[0], clip)
  dense_pair = build_optimizer(opts[1], clip)
  return dense_pair, embed_pair
