"""Feature-interaction layers: FM, Cross (DCN v1/v2), DotInteraction, CIN.

Reference: easy_rec/python/layers/fm.py:10, layers/keras/interaction.py,
model/dcn.py:32-46. All formulated as batched contractions for the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FM(nn.Module):
  """Second-order factorization machine over stacked fields.

  Input [B, F, D] -> sum-square minus square-sum over the field axis.
  Output [B, D] (or [B, 1] when use_variant sums the last axis).
  """
  use_variant: bool = False

  @nn.compact
  def __call__(self, x):
    sum_sq = jnp.square(jnp.sum(x, axis=1))
    sq_sum = jnp.sum(jnp.square(x), axis=1)
    out = 0.5 * (sum_sq - sq_sum)
    if self.use_variant:
      return out
    return jnp.sum(out, axis=-1, keepdims=True)


class CrossNet(nn.Module):
  """DCN-v1 cross layers: x_{l+1} = x0 * (w·x_l) + b + x_l
  (reference model/dcn.py:32-46)."""
  num_layers: int = 3

  @nn.compact
  def __call__(self, x0):
    x = x0
    d = x0.shape[-1]
    for i in range(self.num_layers):
      w = self.param('w_%d' % i, nn.initializers.glorot_uniform(), (d, 1))
      b = self.param('b_%d' % i, nn.initializers.zeros, (d,))
      xw = jnp.matmul(x, w)          # [B, 1]
      x = x0 * xw + b + x
    return x


class CrossNetV2(nn.Module):
  """DCN-v2 cross layers: x_{l+1} = x0 * (W x_l + b) + x_l.

  Pass `x` to start the recursion from a state other than x0 (the
  backbone `recurrent` pattern feeds [x0, x_l] pairs through one
  shared-parameter step)."""
  num_layers: int = 3
  projection_dim: int = 0   # low-rank when > 0

  @nn.compact
  def __call__(self, x0, x=None):
    if x is None:
      x = x0
    d = x0.shape[-1]
    for i in range(self.num_layers):
      if self.projection_dim > 0:
        u = nn.Dense(self.projection_dim, use_bias=False,
                     name='u_%d' % i)(x)
        wx = nn.Dense(d, name='v_%d' % i)(u)
      else:
        wx = nn.Dense(d, name='w_%d' % i)(x)
      x = x0 * wx + x
    return x


class DotInteraction(nn.Module):
  """DLRM pairwise dot interaction over stacked fields.

  Input [B, F, D] -> upper-triangular entries of X·Xᵀ, [B, F*(F-1)/2]
  (+ diagonal when self_interaction). Reference: model/dlrm.py:16,
  layers/keras/interaction.py DotInteraction.
  """
  self_interaction: bool = False

  @nn.compact
  def __call__(self, x):
    inter = jnp.einsum('bfd,bgd->bfg', x, x)
    f = x.shape[1]
    rows, cols = jnp.triu_indices(f, k=0 if self.self_interaction else 1)
    return inter[:, rows, cols]


class CIN(nn.Module):
  """Compressed Interaction Network (xDeepFM).

  Input [B, F, D]; each layer compresses the outer product of the previous
  feature map with the input along the field axes.
  """
  hidden_feature_sizes: tuple = (128, 128)

  @nn.compact
  def __call__(self, x):
    b, f0, d = x.shape
    xk = x
    outputs = []
    for li, h in enumerate(self.hidden_feature_sizes):
      fk = xk.shape[1]
      z = jnp.einsum('bfd,bgd->bfgd', x, xk).reshape(b, f0 * fk, d)
      w = self.param('w_%d' % li, nn.initializers.glorot_uniform(),
                     (f0 * fk, h))
      xk = jnp.einsum('bmd,mh->bhd', z, w)
      outputs.append(jnp.sum(xk, axis=-1))   # [B, h]
    return jnp.concatenate(outputs, axis=-1)
