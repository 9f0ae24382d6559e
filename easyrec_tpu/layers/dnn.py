"""Dense tower layers (DNN / MLP / Highway / Gate).

Reference: easy_rec/python/layers/dnn.py:13, layers/keras/blocks.py.
Dense stacks run as MXU matmuls; activations/BN fold into XLA's fused
epilogue.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def get_activation(name: str) -> Optional[Callable]:
  """Map reference activation names (incl. tf.nn.*) to jax functions."""
  if not name:
    return nn.relu
  key = name.lower().split('.')[-1]
  table = {
      'relu': nn.relu,
      'relu6': nn.relu6,
      'gelu': nn.gelu,
      'swish': nn.swish,
      'silu': nn.silu,
      'sigmoid': nn.sigmoid,
      'tanh': nn.tanh,
      'elu': nn.elu,
      'selu': nn.selu,
      'softplus': nn.softplus,
      'softmax': nn.softmax,
      'leaky_relu': nn.leaky_relu,
      'identity': lambda x: x,
      'linear': lambda x: x,
      'none': lambda x: x,
      'dice': None,  # resolved to Dice module by DNN
  }
  if key not in table:
    raise ValueError('unknown activation %r' % name)
  return table[key]


class Dice(nn.Module):
  """Data-adaptive activation from the DIN paper."""

  @nn.compact
  def __call__(self, x, training: bool = False):
    alpha = self.param('alpha', nn.initializers.zeros, (x.shape[-1],))
    norm = nn.BatchNorm(use_running_average=not training, use_bias=False,
                        use_scale=False, momentum=0.99, epsilon=1e-9)(x)
    p = nn.sigmoid(norm)
    return p * x + (1 - p) * alpha * x


class DNN(nn.Module):
  """Config-driven dense stack: Dense(+BN)(+activation)(+dropout) per layer.

  Mirrors protos/dnn.proto DNN semantics (reference layers/dnn.py:13-70).
  """
  hidden_units: Sequence[int]
  activation: str = 'relu'
  use_bn: bool = True
  dropout_ratio: Sequence[float] = ()
  use_final_activation: bool = True
  # two-tower embedding heads end with a PLAIN linear dense in the
  # reference (hidden_units.pop() + tf.layers.dense, e.g. dssm.py:43-62,
  # dat.py:55-76, dropoutnet.py:80-135, mind.py:139-154): both the
  # activation AND bn are skipped on the last layer there
  use_final_bn: bool = True
  compute_dtype: jnp.dtype = jnp.float32

  @classmethod
  def from_config(cls, cfg, name=None, **kwargs):
    """Build from a DNN proto."""
    return cls(hidden_units=tuple(cfg.hidden_units),
               activation=cfg.activation or 'relu',
               use_bn=cfg.use_bn,
               dropout_ratio=tuple(cfg.dropout_ratio),
               name=name, **kwargs)

  @nn.compact
  def __call__(self, x, training: bool = False):
    act = get_activation(self.activation)
    x = x.astype(self.compute_dtype)
    for i, units in enumerate(self.hidden_units):
      x = nn.Dense(units, dtype=self.compute_dtype, name='dense_%d' % i)(x)
      is_last = (i == len(self.hidden_units) - 1)
      if self.use_bn and (not is_last or self.use_final_bn):
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         dtype=self.compute_dtype, name='bn_%d' % i)(x)
      if not is_last or self.use_final_activation:
        if act is None:  # dice
          x = Dice(name='dice_%d' % i)(x, training)
        else:
          x = act(x)
      if i < len(self.dropout_ratio) and self.dropout_ratio[i] > 0:
        x = nn.Dropout(self.dropout_ratio[i],
                       deterministic=not training)(x)
    return x


def _kernel_init(name: str):
  table = {
      'glorot_uniform': nn.initializers.glorot_uniform(),
      'glorot_normal': nn.initializers.glorot_normal(),
      'he_uniform': nn.initializers.he_uniform(),
      'he_normal': nn.initializers.he_normal(),
      'lecun_uniform': nn.initializers.lecun_uniform(),
      'lecun_normal': nn.initializers.lecun_normal(),
      'zeros': nn.initializers.zeros_init(),
      'ones': nn.initializers.ones_init(),
  }
  return table.get((name or 'glorot_uniform').lower(),
                   nn.initializers.glorot_uniform())


class MLP(nn.Module):
  """Extended MLP used by the backbone DSL (protos/dnn.proto MLP)."""
  hidden_units: Sequence[int]
  activation: str = 'relu'
  use_bn: bool = True
  use_final_bn: bool = True
  final_activation: str = 'relu'
  use_bias: bool = False
  dropout_ratio: Sequence[float] = ()
  use_final_bias: bool = False
  use_bn_after_activation: bool = False
  kernel_initializer: str = 'glorot_uniform'
  compute_dtype: jnp.dtype = jnp.float32

  @classmethod
  def from_config(cls, cfg, name=None, **kwargs):
    return cls(hidden_units=tuple(cfg.hidden_units),
               activation=cfg.activation or 'relu',
               use_bn=cfg.use_bn,
               use_final_bn=cfg.use_final_bn,
               final_activation=cfg.final_activation or 'relu',
               use_bias=cfg.use_bias,
               dropout_ratio=tuple(cfg.dropout_ratio),
               use_final_bias=cfg.use_final_bias,
               use_bn_after_activation=getattr(
                   cfg, 'use_bn_after_activation', False),
               kernel_initializer=getattr(cfg, 'initializer', '')
               or 'he_uniform',
               name=name, **kwargs)

  @nn.compact
  def __call__(self, x, training: bool = False):
    x = x.astype(self.compute_dtype)
    n = len(self.hidden_units)
    for i, units in enumerate(self.hidden_units):
      is_last = (i == n - 1)
      use_bias = self.use_final_bias if is_last else self.use_bias
      x = nn.Dense(units, use_bias=use_bias, dtype=self.compute_dtype,
                   kernel_init=_kernel_init(self.kernel_initializer),
                   name='dense_%d' % i)(x)
      use_bn = self.use_final_bn if is_last else self.use_bn
      if use_bn and not self.use_bn_after_activation:
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         dtype=self.compute_dtype, name='bn_%d' % i)(x)
      act_name = self.final_activation if is_last else self.activation
      act = get_activation(act_name)
      if act is None:
        x = Dice(name='dice_%d' % i)(x, training)
      else:
        x = act(x)
      if use_bn and self.use_bn_after_activation:
        # PPNet-style post-activation BN (reference keras/ppnet.py:166)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         dtype=self.compute_dtype, name='bn_%d' % i)(x)
      if i < len(self.dropout_ratio) and self.dropout_ratio[i] > 0:
        x = nn.Dropout(self.dropout_ratio[i], deterministic=not training)(x)
    return x


class Highway(nn.Module):
  """Highway tower (reference layers/keras/blocks.py Highway)."""
  emb_size: int
  activation: str = 'relu'
  dropout_rate: float = 0.0
  init_gate_bias: float = -3.0
  num_layers: int = 1

  @nn.compact
  def __call__(self, x, training: bool = False):
    act = get_activation(self.activation)
    x = nn.Dense(self.emb_size, name='input_proj')(x)
    for i in range(self.num_layers):
      gate = nn.Dense(
          self.emb_size,
          bias_init=nn.initializers.constant(self.init_gate_bias),
          name='gate_%d' % i)(x)
      gate = nn.sigmoid(gate)
      nonlin = act(nn.Dense(self.emb_size, name='transform_%d' % i)(x))
      if self.dropout_rate > 0:
        nonlin = nn.Dropout(self.dropout_rate,
                            deterministic=not training)(nonlin)
      x = gate * nonlin + (1 - gate) * x
    return x
