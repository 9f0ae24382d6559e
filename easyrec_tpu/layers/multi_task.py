"""Multi-task layers: MMoE experts/gates, PLE CGC extraction networks.

Reference: easy_rec/python/layers/mmoe.py, model/ple.py:62-89.
Experts run as one batched einsum so the MXU sees a single large matmul
instead of num_expert small ones.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import DNN


class BatchedExperts(nn.Module):
  """num_expert parallel DNNs, evaluated as batched matmuls.

  Input [B, D] -> [B, E, out]."""
  num_expert: int
  hidden_units: Sequence[int]
  activation: str = 'relu'
  dropout_ratio: Sequence[float] = ()

  @nn.compact
  def __call__(self, x, training: bool = False):
    from easyrec_tpu.layers.dnn import get_activation
    act = get_activation(self.activation)
    # batch_axis marks the expert dim as independent replicas: plain
    # he_uniform on the 3D shape counts E into fan_in and under-scales
    # every expert layer by sqrt(E) (caught by quality_proxy_mt: MMoE
    # ctr AUC -0.067 vs the independent torch reference)
    he_expert = nn.initializers.variance_scaling(
        2.0, 'fan_in', 'uniform', batch_axis=0)
    h = jnp.repeat(x[:, None, :], self.num_expert, axis=1)  # [B, E, D]
    for i, units in enumerate(self.hidden_units):
      w = self.param('w_%d' % i, he_expert,
                     (self.num_expert, h.shape[-1], units))
      b = self.param('b_%d' % i, nn.initializers.zeros,
                     (self.num_expert, units))
      h = jnp.einsum('bed,edu->beu', h, w) + b[None]
      h = act(h)
      if i < len(self.dropout_ratio) and self.dropout_ratio[i] > 0:
        h = nn.Dropout(self.dropout_ratio[i],
                       deterministic=not training)(h)
    return h


class MMoE(nn.Module):
  """Multi-gate mixture of experts: per-task softmax gates over shared
  experts (reference layers/mmoe.py)."""
  num_task: int
  num_expert: int
  expert_hidden_units: Sequence[int]
  expert_activation: str = 'relu'
  expert_dropout: Sequence[float] = ()

  @nn.compact
  def __call__(self, x, training: bool = False):
    experts = BatchedExperts(
        num_expert=self.num_expert,
        hidden_units=self.expert_hidden_units,
        activation=self.expert_activation,
        dropout_ratio=self.expert_dropout,
        name='experts')(x, training)               # [B, E, U]
    outs = []
    for t in range(self.num_task):
      gate = nn.Dense(self.num_expert, name='gate_%d' % t)(x)
      gate = nn.softmax(gate, axis=-1)
      outs.append(jnp.einsum('be,beu->bu', gate, experts))
    return outs


class CGCLayer(nn.Module):
  """One PLE Customized-Gate-Control extraction layer
  (reference model/ple.py:62-89).

  Inputs: list of num_task task tensors + 1 shared tensor.
  Outputs: same structure (shared output omitted on the final layer).
  """
  num_task: int
  expert_num_per_task: int
  share_num: int
  task_hidden_units: Sequence[int]
  share_hidden_units: Sequence[int]
  final_layer: bool = False
  activation: str = 'relu'

  @nn.compact
  def __call__(self, task_inputs, shared_input, training: bool = False):
    task_experts = []
    for t in range(self.num_task):
      e = BatchedExperts(num_expert=self.expert_num_per_task,
                         hidden_units=self.task_hidden_units,
                         activation=self.activation,
                         name='task_experts_%d' % t)(
                             task_inputs[t], training)
      task_experts.append(e)                        # [B, Et, U]
    shared_experts = BatchedExperts(
        num_expert=self.share_num, hidden_units=self.share_hidden_units,
        activation=self.activation, name='share_experts')(
            shared_input, training)                 # [B, Es, U]

    task_outs = []
    for t in range(self.num_task):
      cand = jnp.concatenate([task_experts[t], shared_experts], axis=1)
      gate = nn.Dense(cand.shape[1], name='task_gate_%d' % t)(
          task_inputs[t])
      gate = nn.softmax(gate, axis=-1)
      task_outs.append(jnp.einsum('be,beu->bu', gate, cand))
    if self.final_layer:
      return task_outs, None
    all_experts = jnp.concatenate(task_experts + [shared_experts], axis=1)
    share_gate = nn.Dense(all_experts.shape[1], name='share_gate')(
        shared_input)
    share_gate = nn.softmax(share_gate, axis=-1)
    shared_out = jnp.einsum('be,beu->bu', share_gate, all_experts)
    return task_outs, shared_out
