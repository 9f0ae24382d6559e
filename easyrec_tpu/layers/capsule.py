"""B2I dynamic-routing capsule layer for MIND multi-interest extraction.

Reference: easy_rec/python/layers/capsule_layer.py:12-176. Routing runs a
fixed number of iterations via lax.fori_loop-style unrolling (num_iters is
small and static), with masked softmax over valid behaviors.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def squash(x, pow: float = 1.0, axis: int = -1):
  """Capsule squash nonlinearity."""
  sq_norm = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
  scale = jnp.power(sq_norm / (1.0 + sq_norm), pow) * jax.lax.rsqrt(
      sq_norm + 1e-9)
  return x * scale


class CapsuleLayer(nn.Module):
  """Behavior-to-interest dynamic routing.

  seq [B, L, D], mask [B, L] -> (interests [B, K, high_dim],
  interest_mask [B, K]). The number of active capsules per user follows
  log2(seq_len) unless const_caps_num.
  """
  max_k: int = 5
  high_dim: int = 64
  num_iters: int = 3
  routing_logits_scale: float = 20.0
  routing_logits_stddev: float = 1.0
  squash_pow: float = 1.0
  const_caps_num: bool = False

  @nn.compact
  def __call__(self, seq, mask, training: bool = False):
    b, l, d = seq.shape
    k = self.max_k
    # bilinear map shared across behaviors (S in the paper)
    s = self.param('bilinear', nn.initializers.glorot_uniform(),
                   (d, self.high_dim))
    u = jnp.einsum('bld,de->ble', seq, s)            # behavior capsules

    # number of interests per user: log2(len) clipped to [1, max_k]
    if self.const_caps_num:
      n_caps = jnp.full((b,), float(k))
    else:
      seq_len = jnp.maximum(mask.sum(axis=1), 1.0)
      n_caps = jnp.clip(jnp.log2(seq_len), 1.0, float(k))
    cap_mask = (jnp.arange(k)[None, :] < jnp.ceil(n_caps)[:, None]) \
        .astype(seq.dtype)                            # [B, K]

    # fixed random routing logits (stop-gradient, as in the reference which
    # uses an untrainable random init re-drawn per batch region)
    init_logits = self.routing_logits_stddev * jax.random.normal(
        self.make_rng('routing') if self.has_rng('routing') else
        jax.random.PRNGKey(11), (b, k, l))
    logits = init_logits

    u_stop = jax.lax.stop_gradient(u)
    interests = None
    for it in range(self.num_iters):
      last = (it == self.num_iters - 1)
      # mask invalid behaviors and capsules before softmax over capsules
      masked_logits = jnp.where(cap_mask[:, :, None] > 0,
                                logits * self.routing_logits_scale, -1e9)
      w = nn.softmax(masked_logits, axis=1)           # over K
      w = w * mask[:, None, :]
      src = u if last else u_stop
      z = jnp.einsum('bkl,ble->bke', w, src)
      interests = squash(z, pow=self.squash_pow)
      if not last:
        logits = logits + jnp.einsum('bke,ble->bkl',
                                     jax.lax.stop_gradient(interests),
                                     u_stop)
    interests = interests * cap_mask[:, :, None]
    return interests, cap_mask
