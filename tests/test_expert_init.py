"""Batched per-replica params must match the per-matrix init scale of
the reference's looped Dense variables (quality_proxy_mt caught MMoE
ctr AUC -0.067: plain he/glorot on [E, D, U] counts E into fan_in and
under-scales every expert by sqrt(E))."""

import jax
import numpy as np
from flax import linen as nn

from easyrec_tpu.layers.multi_task import BatchedExperts
from easyrec_tpu.layers.fibinet import Bilinear


def test_batched_expert_init_matches_single_dense_scale():
  m = BatchedExperts(num_expert=4, hidden_units=(64,))
  params = m.init(jax.random.PRNGKey(0), np.zeros((2, 32), np.float32))
  w = params['params']['w_0']  # [4, 32, 64]
  ref = nn.initializers.he_uniform()(jax.random.PRNGKey(1), (32, 64))
  assert abs(float(w.std()) / float(ref.std()) - 1.0) < 0.1, (
      w.std(), ref.std())


def test_bilinear_each_init_matches_single_dense_scale():
  m = Bilinear(type='each')
  params = m.init(jax.random.PRNGKey(0),
                  np.zeros((2, 8, 16), np.float32))
  w = params['params']['w']  # [8, 16, 16]
  ref = nn.initializers.glorot_uniform()(jax.random.PRNGKey(1), (16, 16))
  assert abs(float(w.std()) / float(ref.std()) - 1.0) < 0.15, (
      w.std(), ref.std())
