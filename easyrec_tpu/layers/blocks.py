"""Backbone building blocks: gates, PPNet, TextCNN, AITM, sequence
augmentation, auxiliary losses.

Reference: easy_rec/python/layers/keras/{blocks.py (Gate/TextCNN),
ppnet.py, multi_task.py (AITMTower), data_augment.py (SeqAugment),
auxiliary_loss.py}.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import MLP, get_activation


class GateNN(nn.Module):
  """Small 2-layer gate network ending in 2*sigmoid (PPNet gate)."""
  output_dim: int
  hidden_dim: int = 0
  activation: str = 'relu'
  dropout_rate: float = 0.0

  @nn.compact
  def __call__(self, x, training: bool = False):
    act = get_activation(self.activation)
    hidden = self.hidden_dim or self.output_dim
    x = act(nn.Dense(hidden, name='hidden')(x))
    if self.dropout_rate > 0:
      x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
    return 2.0 * nn.sigmoid(nn.Dense(self.output_dim, name='gate')(x))


class PPNet(nn.Module):
  """Parameter Personalization Net (KuaiShou PEPNet). A gate network fed
  by id ("memorize") features scales every MLP hidden layer.

  Call with [general_input, gate_input] (reference ppnet.py).
  mode 'eager': one gate per hidden layer; 'lazy': single gate on input.
  """
  hidden_units: Sequence[int]
  gate_hidden_dim: int = 0
  activation: str = 'relu'
  dropout_ratio: Sequence[float] = ()
  mode: str = 'eager'
  full_gate_input: bool = True
  use_bn: bool = True

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    if not isinstance(inputs, (list, tuple)) or len(inputs) != 2:
      raise ValueError(
          'PPNet expects [general_input, gate_input] — set '
          'merge_inputs_into_list: true on the backbone block '
          '(got %s)' % type(inputs).__name__)
    x, gate_feats = inputs
    act = get_activation(self.activation)
    gate_in = jnp.concatenate(
        [jax.lax.stop_gradient(x), gate_feats], axis=-1) \
        if self.full_gate_input else gate_feats
    if self.mode != 'eager':
      gate = GateNN(output_dim=x.shape[-1],
                    hidden_dim=self.gate_hidden_dim,
                    name='gate_in')(gate_in, training)
      x = x * gate
    for i, units in enumerate(self.hidden_units):
      x = nn.Dense(units, name='dense_%d' % i)(x)
      if self.use_bn:
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         name='bn_%d' % i)(x)
      x = act(x)
      if i < len(self.dropout_ratio) and self.dropout_ratio[i] > 0:
        x = nn.Dropout(self.dropout_ratio[i],
                       deterministic=not training)(x)
      if self.mode == 'eager':
        gate = GateNN(output_dim=units, hidden_dim=self.gate_hidden_dim,
                      name='gate_%d' % i)(gate_in, training)
        x = x * gate
    return x


class TextCNN(nn.Module):
  """Convolutional text/sequence encoder: parallel 1-D convs of several
  widths, max-pool over time, concat, optional MLP."""
  filter_sizes: Sequence[int] = (2, 3, 4)
  num_filters: Sequence[int] = (128, 64, 64)
  activation: str = 'relu'
  mlp_hidden_units: Sequence[int] = ()

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    if isinstance(inputs, (list, tuple)):
      seq, mask = inputs[0], inputs[1]
    else:
      seq, mask = inputs, None
    act = get_activation(self.activation)
    if mask is not None:
      seq = seq * mask[:, :, None]
    pools = []
    for i, (width, filters) in enumerate(
        zip(self.filter_sizes, self.num_filters)):
      conv = nn.Conv(features=int(filters), kernel_size=(int(width),),
                     padding='VALID', name='conv_%d' % i)(seq)
      conv = act(conv)
      pools.append(jnp.max(conv, axis=1))
    out = jnp.concatenate(pools, axis=-1)
    if self.mlp_hidden_units:
      out = MLP(hidden_units=self.mlp_hidden_units, name='mlp')(
          out, training)
    return out


class Gate(nn.Module):
  """Weighted-sum gate over a list of inputs: element `weight_index` IS
  the weight vector (its columns weight the remaining inputs, which are
  expected to be pre-normalized, e.g. a softmax-activated MLP); optional
  MLP on the gated output (reference blocks.py Gate:180-209)."""
  weight_index: int = 0
  mlp_hidden_units: Sequence[int] = ()

  @nn.compact
  def __call__(self, inputs: List[Any], training: bool = False):
    assert len(inputs) > 1, 'Gate input must be a list of >= 2 elements'
    w = inputs[self.weight_index]
    others = [v for i, v in enumerate(inputs) if i != self.weight_index]
    stacked = jnp.stack(others, axis=1)            # [B, K, D]
    out = jnp.einsum('bk,bkd->bd', w[:, :len(others)], stacked)
    if self.mlp_hidden_units:
      out = MLP(hidden_units=self.mlp_hidden_units, name='top_mlp')(
          out, training)
    return out


class AITMTower(nn.Module):
  """Adaptive Information Transfer Multi-task tower (AITM, KDD'21).

  Call with [current_tower_input, prev_tower_output...]; attention over
  {transferred prev info, current} (reference multi_task.py AITMTower).
  """
  project_dim: int = 0
  transfer_hidden_units: Sequence[int] = ()
  stop_gradient: bool = True

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    if not isinstance(inputs, (list, tuple)):
      return inputs
    current, prevs = inputs[0], list(inputs[1:])
    if not prevs:
      return current
    dim = self.project_dim or current.shape[-1]
    current_p = nn.Dense(dim, name='proj_current')(current)
    infos = [current_p]
    for i, p in enumerate(prevs):
      if self.stop_gradient:
        p = jax.lax.stop_gradient(p)
      if self.transfer_hidden_units:
        p = MLP(hidden_units=self.transfer_hidden_units,
                name='transfer_%d' % i)(p, training)
      infos.append(nn.Dense(dim, name='proj_prev_%d' % i)(p))
    u = jnp.stack(infos, axis=1)                   # [B, K, dim]
    q = nn.Dense(dim, name='q')(u)
    k = nn.Dense(dim, name='k')(u)
    v = nn.Dense(dim, name='v')(u)
    scores = jnp.sum(q * k, axis=-1) / jnp.sqrt(float(dim))
    w = nn.softmax(scores, axis=1)
    return jnp.einsum('bk,bkd->bd', w, v)


class SeqAugment(nn.Module):
  """Random mask / crop / reorder augmentation of a [B, L, D] sequence
  (CL4SRec-style; reference data_augment.py). Uses the 'augment' rng
  stream; identity when not training."""
  mask_rate: float = 0.6
  crop_rate: float = 0.2
  reorder_rate: float = 0.6

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    # [seq, mask(, extras...)] — extras (e.g. the normal/target features
    # from output_seq_and_normal_feature) pass through untouched, like
    # the reference's inputs[:2] slice (data_augment.py:122-124)
    extra = []
    if isinstance(inputs, (list, tuple)):
      seq = inputs[0]
      mask = inputs[1] if len(inputs) > 1 else None
      extra = list(inputs[2:])
    else:
      seq, mask = inputs, None
    if not training:
      return [seq, mask] + extra if mask is not None else seq
    rng = self.make_rng('augment')
    r_mask, r_crop, r_perm, r_choice = jax.random.split(rng, 4)
    b, length = seq.shape[0], seq.shape[1]

    # mask: zero random positions
    keep = jax.random.bernoulli(r_mask, 1.0 - self.mask_rate, (b, length))
    masked = seq * keep[:, :, None].astype(seq.dtype)

    # crop: keep a random contiguous window of (1-crop_rate)*L
    win = max(int(length * (1.0 - self.crop_rate)), 1)
    start = jax.random.randint(r_crop, (b, 1), 0, length - win + 1)
    pos = jnp.arange(length)[None, :]
    in_win = (pos >= start) & (pos < start + win)
    cropped = seq * in_win[:, :, None].astype(seq.dtype)

    # reorder: shuffle a random sub-window
    perm = jax.random.permutation(r_perm, length)
    reordered = seq[:, perm, :]

    choice = jax.random.randint(r_choice, (b,), 0, 3)
    out = jnp.where((choice == 0)[:, None, None], masked,
                    jnp.where((choice == 1)[:, None, None], cropped,
                              reordered))
    if mask is not None:
      return [out, mask] + extra
    return out


class AuxiliaryLoss(nn.Module):
  """Computes an extra loss from block outputs and sows it into the
  'losses' collection (summed by the trainer). loss_type: l2_loss /
  cosine / info_nce / nce (reference keras/auxiliary_loss.py)."""
  loss_type: str = 'l2_loss'
  loss_weight: float = 1.0
  temperature: float = 0.1

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    x1, x2 = inputs[0], inputs[1]
    if self.loss_type == 'cosine':
      n1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True),
                            1e-9)
      n2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True),
                            1e-9)
      loss = -jnp.mean(jnp.sum(n1 * n2, axis=-1))
    elif self.loss_type in ('info_nce', 'nce'):
      n1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True),
                            1e-9)
      n2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True),
                            1e-9)
      logits = jnp.matmul(n1, n2.T) / self.temperature
      labels = jnp.arange(x1.shape[0])
      loss = jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[
          labels, labels])
    else:  # l2
      loss = jnp.mean(jnp.sum(jnp.square(x1 - x2), axis=-1))
    self.sow('losses', 'aux_loss', self.loss_weight * loss)
    return x1


class EinsumDense(nn.Module):
  """Dense layer expressed as an einsum equation (keras EinsumDense)."""
  equation: str
  output_shape: Sequence[int]
  activation: str = ''
  bias_axes: str = ''

  @nn.compact
  def __call__(self, x, training: bool = False):
    # derive kernel shape from the equation: in,kernel->out
    lhs, out_spec = self.equation.split('->')
    in_spec, kernel_spec = lhs.split(',')
    dims = {}
    for ax, size in zip(in_spec, x.shape):
      dims[ax] = size
    out_shape = list(self.output_shape)
    for ax, size in zip(out_spec[1:], out_shape):  # skip batch axis
      dims.setdefault(ax, size)
    kernel_shape = tuple(dims[ax] for ax in kernel_spec)
    kernel = self.param('kernel', nn.initializers.glorot_uniform(),
                        kernel_shape)
    out = jnp.einsum(self.equation, x, kernel)
    if self.bias_axes:
      bias_shape = tuple(dims[ax] for ax in self.bias_axes)
      bias = self.param('bias', nn.initializers.zeros, bias_shape)
      out = out + bias
    act = get_activation(self.activation) if self.activation else None
    return act(out) if act else out


class LayerNorm(nn.Module):
  """Thin wrapper so 'LayerNorm' resolves in the layer registry."""

  @nn.compact
  def __call__(self, x, training: bool = False):
    return nn.LayerNorm()(x)
