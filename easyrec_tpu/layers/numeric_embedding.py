"""Numeric-feature embeddings: Periodic, AutoDis, NaryDis.

Reference: easy_rec/python/layers/keras/numerical_embedding.py
(PeriodicEmbedding / AutoDisEmbedding / NaryDisEmbedding, used by
backbone configs like dlrm_on_criteo_*.config). All three turn a dense
[B, N] matrix of raw numeric features into learned embeddings — batched
matmul-friendly formulations rather than per-feature loops.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from easyrec_tpu.layers.dnn import get_activation


def _shape_output(emb, output_3d: bool, output_list: bool):
  """emb [B, N, D] -> 3d tensor / list of [B, D] / flat [B, N*D]."""
  if output_list:
    return [emb[:, i, :] for i in range(emb.shape[1])]
  if output_3d:
    return emb
  b, n, d = emb.shape
  return emb.reshape(b, n * d)


class PeriodicEmbedding(nn.Module):
  """sin/cos positional-style embedding of raw numerics
  ("On Embeddings for Numerical Features in Tabular DL", NeurIPS'22).

  Input [B, N] -> per-feature coefficients c ~ N(0, sigma^2) [N, D/2];
  features = [sin(2*pi*c*x), cos(2*pi*c*x)] -> optional per-feature linear.
  """
  embedding_dim: int
  sigma: float = 1.0
  add_linear_layer: bool = True
  linear_activation: str = 'relu'
  output_3d_tensor: bool = False
  output_tensor_list: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    if x.ndim == 1:
      x = x[:, None]
    n = x.shape[-1]
    half = max(self.embedding_dim // 2, 1)
    coef = self.param('coef', nn.initializers.normal(self.sigma), (n, half))
    v = 2.0 * math.pi * coef[None, :, :] * x[:, :, None]   # [B, N, half]
    emb = jnp.concatenate([jnp.sin(v), jnp.cos(v)], axis=-1)
    if self.add_linear_layer:
      # one dense per feature, batched as a single einsum on the MXU
      w = self.param('linear_w', nn.initializers.glorot_uniform(),
                     (n, 2 * half, self.embedding_dim))
      b = self.param('linear_b', nn.initializers.zeros,
                     (n, self.embedding_dim))
      emb = jnp.einsum('bnk,nkd->bnd', emb, w) + b[None]
      act = get_activation(self.linear_activation)
      if act is not None:
        emb = act(emb)
    return _shape_output(emb, self.output_3d_tensor,
                         self.output_tensor_list)


class AutoDisEmbedding(nn.Module):
  """AutoDis: automatic soft discretization of numeric features
  (Guo et al., KDD'21). Input [B, N] -> softmax over learned bins ->
  weighted sum of per-feature meta embeddings [N, num_bins, D]."""
  embedding_dim: int
  num_bins: int
  temperature: float = 1.0
  keep_prob: float = 0.8
  output_3d_tensor: bool = False
  output_tensor_list: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    if x.ndim == 1:
      x = x[:, None]
    n = x.shape[-1]
    meta = self.param('meta_embedding', nn.initializers.glorot_uniform(),
                      (n, self.num_bins, self.embedding_dim))
    w = self.param('proj_w', nn.initializers.glorot_uniform(),
                   (n, self.num_bins))
    mat = self.param('proj_mat', nn.initializers.glorot_uniform(),
                     (n, self.num_bins, self.num_bins))
    hidden = nn.leaky_relu(w[None, :, :] * x[:, :, None])   # [B, N, bins]
    # skip-connected second projection (alpha = keep_prob)
    logits = jnp.einsum('nkj,bnj->bnk', mat, hidden) + \
        self.keep_prob * hidden
    weights = nn.softmax(logits / self.temperature, axis=-1)
    emb = jnp.einsum('bnk,nkd->bnd', weights, meta)
    return _shape_output(emb, self.output_3d_tensor,
                         self.output_tensor_list)


class NaryDisEmbedding(nn.Module):
  """N-ary discretization: encode each (integerized) numeric value in one
  or more radixes, embed every digit, pool within a radix and combine
  across radixes (reference NaryDisEmbedding; custom C++ digit op replaced
  by vectorized jnp floor-div/mod — compiler-friendly, no host op).
  """
  embedding_dim: int
  carries: Sequence[int] = (2, 9)
  multiplier: float = 1.0
  intra_ary_pooling: str = 'sum'
  inter_ary_pooling: str = 'concat'
  output_3d_tensor: bool = False
  output_tensor_list: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    if x.ndim == 1:
      x = x[:, None]
    n = x.shape[-1]
    vals = jnp.maximum(x * self.multiplier, 0.0).astype(jnp.int32)
    per_carry = []
    for ci, carry in enumerate(self.carries):
      carry = int(carry)
      num_digits = max(int(np.ceil(31 / np.log2(max(carry, 2)))), 1)
      # digit-position-aware vocabulary: digit d at position p -> p*carry+d
      table = self.param('emb_carry%d' % ci,
                         nn.initializers.normal(0.01),
                         (num_digits * carry, self.embedding_dim))
      v = vals
      digit_ids = []
      for p in range(num_digits):
        digit_ids.append(v % carry + p * carry)
        v = v // carry
      ids = jnp.stack(digit_ids, axis=-1)        # [B, N, num_digits]
      emb = jnp.take(table, ids, axis=0)         # [B, N, digits, D]
      if self.intra_ary_pooling == 'mean':
        pooled = jnp.mean(emb, axis=2)
      else:
        pooled = jnp.sum(emb, axis=2)
      per_carry.append(pooled)                   # [B, N, D]
    if len(per_carry) == 1:
      out = per_carry[0]
    elif self.inter_ary_pooling == 'sum':
      out = sum(per_carry)
    elif self.inter_ary_pooling == 'mean':
      out = sum(per_carry) / len(per_carry)
    else:  # concat along the embedding axis
      out = jnp.concatenate(per_carry, axis=-1)
    return _shape_output(out, self.output_3d_tensor,
                         self.output_tensor_list)
