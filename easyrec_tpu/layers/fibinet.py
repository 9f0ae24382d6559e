"""SENet / Bilinear / FiBiNet / MaskNet feature-refinement layers.

Reference: easy_rec/python/layers/senet.py, layers/keras/fibinet.py,
layers/keras/mask_net.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import MLP


class SENet(nn.Module):
  """Squeeze-and-excitation over embedding fields: input [B, F, D] ->
  reweighted [B, F*D] (v2 flavor with group squeeze + skip + LN)."""
  reduction_ratio: int = 4
  num_squeeze_group: int = 2
  use_skip_connection: bool = True
  use_output_layer_norm: bool = True

  @nn.compact
  def __call__(self, x):
    b, f, d = x.shape
    g = self.num_squeeze_group
    assert d % g == 0, 'embedding dim must divide num_squeeze_group'
    grouped = x.reshape(b, f, g, d // g)
    z_mean = jnp.mean(grouped, axis=-1)
    z_max = jnp.max(grouped, axis=-1)
    z = jnp.concatenate([z_mean, z_max], axis=-1).reshape(b, f * g * 2)
    reduction = max(1, (f * g * 2) // self.reduction_ratio)
    a = nn.relu(nn.Dense(reduction, name='squeeze')(z))
    a = nn.relu(nn.Dense(f * d, name='excite')(a))
    out = x.reshape(b, f * d) * a
    if self.use_skip_connection:
      out = out + x.reshape(b, f * d)
    if self.use_output_layer_norm:
      out = nn.LayerNorm(name='ln')(out)
    return out


class Bilinear(nn.Module):
  """Bilinear field interaction ('all'/'each'/'interaction' types)."""
  type: str = 'interaction'
  use_plus: bool = True
  num_output_units: int = 0

  @nn.compact
  def __call__(self, x):
    b, f, d = x.shape
    rows, cols = jnp.triu_indices(f, k=1)
    # the reference builds one Dense(dim) PER field/pair, so each (d,d)
    # matrix gets its own glorot fan; batch_axis keeps that scaling on
    # the stacked param (plain glorot on the 3D shape would divide by
    # an extra sqrt(f) / sqrt(n_pairs))
    glorot_each = nn.initializers.variance_scaling(
        1.0, 'fan_avg', 'uniform', batch_axis=0)
    if self.type == 'all':
      w = self.param('w', nn.initializers.glorot_uniform(), (d, d))
      left = jnp.einsum('bfd,de->bfe', x, w)
    elif self.type == 'each':
      w = self.param('w', glorot_each, (f, d, d))
      left = jnp.einsum('bfd,fde->bfe', x, w)
    else:  # interaction: one matrix per pair
      w = self.param('w', glorot_each,
                     (len(rows), d, d))
      left_pairs = jnp.einsum('bpd,pde->bpe', x[:, rows, :], w)
      inter = left_pairs * x[:, cols, :] if self.use_plus else \
          left_pairs + x[:, cols, :]
      out = inter.reshape(b, -1)
      if self.num_output_units:
        out = nn.Dense(self.num_output_units, name='out')(out)
      return out
    inter = left[:, rows, :] * x[:, cols, :]
    out = inter.reshape(b, -1)
    if self.num_output_units:
      out = nn.Dense(self.num_output_units, name='out')(out)
    return out


class FiBiNet(nn.Module):
  """SENet + bilinear interactions on raw and SE branches -> MLP."""
  senet_reduction_ratio: int = 4
  senet_num_squeeze_group: int = 2
  bilinear_type: str = 'interaction'
  bilinear_output_units: int = 0
  mlp_hidden_units: Sequence[int] = ()

  @nn.compact
  def __call__(self, x, training: bool = False):
    b, f, d = x.shape
    se = SENet(reduction_ratio=self.senet_reduction_ratio,
               num_squeeze_group=self.senet_num_squeeze_group,
               name='senet')(x).reshape(b, f, d)
    bi_raw = Bilinear(type=self.bilinear_type,
                      num_output_units=self.bilinear_output_units,
                      name='bilinear_raw')(x)
    bi_se = Bilinear(type=self.bilinear_type,
                     num_output_units=self.bilinear_output_units,
                     name='bilinear_se')(se)
    out = jnp.concatenate([bi_raw, bi_se], axis=-1)
    if self.mlp_hidden_units:
      out = MLP(hidden_units=self.mlp_hidden_units, name='mlp')(
          out, training)
    return out


class MaskBlock(nn.Module):
  """MaskNet block: instance-guided mask over (layer-normed) input."""
  output_size: int
  reduction_factor: float = 0.0
  aggregation_size: int = 0
  input_layer_norm: bool = False
  projection_dim: int = 0

  @nn.compact
  def __call__(self, inputs, mask_input):
    x = inputs
    if self.input_layer_norm:
      x = nn.LayerNorm(name='input_ln')(x)
    agg = self.aggregation_size or int(
        mask_input.shape[-1] * (self.reduction_factor or 1.0))
    h = nn.relu(nn.Dense(agg, name='mask_hidden')(mask_input))
    mask = nn.Dense(x.shape[-1], name='mask_out')(h)
    masked = x * mask
    out = nn.Dense(self.output_size, use_bias=False, name='proj')(masked)
    return nn.relu(nn.LayerNorm(name='out_ln')(out))


class MaskNet(nn.Module):
  """Parallel or serial stack of MaskBlocks + top MLP."""
  block_output_sizes: Sequence[int]
  block_reduction_factors: Sequence[float] = ()
  use_parallel: bool = True
  mlp_hidden_units: Sequence[int] = ()
  input_layer_norm: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    inp = nn.LayerNorm(name='input_ln')(x) if self.input_layer_norm else x
    reds = list(self.block_reduction_factors) or [1.0] * len(
        self.block_output_sizes)
    if self.use_parallel:
      outs = [MaskBlock(output_size=sz, reduction_factor=reds[i],
                        name='block_%d' % i)(inp, inp)
              for i, sz in enumerate(self.block_output_sizes)]
      out = jnp.concatenate(outs, axis=-1)
    else:
      out = inp
      for i, sz in enumerate(self.block_output_sizes):
        out = MaskBlock(output_size=sz, reduction_factor=reds[i],
                        name='block_%d' % i)(out, inp)
    if self.mlp_hidden_units:
      out = MLP(hidden_units=self.mlp_hidden_units, name='mlp')(
          out, training)
    return out
