"""Variational dropout for feature importance
(reference easy_rec/python/layers/variational_dropout_layer.py).

Learns a per-feature drop probability p_i = sigmoid(logit_p_i) with a
concrete (Gumbel-sigmoid) relaxation during training; the regularizer
pushes p up, so features the model refuses to drop are the important
ones. Importance = 1 - p, read back by tools/feature_selection.py from
the checkpoint ('variational_dropout'/'logit_p').
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class VariationalDropout(nn.Module):
  """Applies learned per-feature (or per-embedding-dim) dropout to a list
  of per-feature embeddings; sows its regularization loss."""
  feature_names: Sequence[str]
  regularization_lambda: float = 0.01
  embedding_wise: bool = False
  temperature: float = 0.1

  @nn.compact
  def __call__(self, feature_list: List[jnp.ndarray],
               training: bool = False) -> List[jnp.ndarray]:
    n = len(feature_list)
    if self.embedding_wise:
      sizes = [int(f.shape[-1]) for f in feature_list]
      logit_p = self.param('logit_p', nn.initializers.constant(-2.0),
                           (sum(sizes),))
      splits = jnp.cumsum(jnp.asarray(sizes))[:-1]
      per_feat = jnp.split(logit_p, splits)
    else:
      logit_p = self.param('logit_p', nn.initializers.constant(-2.0),
                           (n,))
      per_feat = [logit_p[i] for i in range(n)]

    p = jax.nn.sigmoid(logit_p)
    # regularizer: pay for every KEPT feature -> useless features get
    # dropped, importance = 1 - p
    self.sow('losses', 'variational_dropout_loss',
             self.regularization_lambda * jnp.mean(1.0 - p))

    out = []
    for i, feat in enumerate(feature_list):
      lp = jnp.asarray(per_feat[i])
      if training:
        u = jax.random.uniform(self.make_rng('dropout'),
                               (feat.shape[0],) + lp.shape,
                               minval=1e-6, maxval=1.0 - 1e-6)
        noise = jnp.log(u) - jnp.log(1.0 - u)
        drop = jax.nn.sigmoid((lp + noise) / self.temperature)
        keep = 1.0 - drop
      else:
        keep = 1.0 - jax.nn.sigmoid(lp)
      if keep.ndim == 0:
        keep = keep[None]
      while keep.ndim < feat.ndim:
        if keep.shape[0] == feat.shape[0]:
          keep = keep[..., None]       # [B] -> [B, 1]
        else:
          keep = keep[None]            # [D] -> [1, D]
      out.append(feat * keep)
    return out
