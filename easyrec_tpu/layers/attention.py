"""Attention layers: DIN target attention, multi-head self-attention
(AutoInt), transformer encoder (BST).

Reference: easy_rec/python/layers/sequence_feature_layer.py:123-190 (DIN),
model/autoint.py, layers/keras/{din,bst,transformer}.py. Everything is
batched masked attention over padded [B, L, D] — XLA-friendly static shapes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import DNN, get_activation

_NEG_INF = -1e9


class DinAttention(nn.Module):
  """DIN target attention: score(hist_t | query) via an MLP over
  [q, h, q-h, q*h], masked softmax over valid steps, weighted sum.

  query [B, D], keys [B, L, D], mask [B, L] -> [B, D]
  Reference: model/multi_tower_din.py:62-98.
  """
  attention_dims: Sequence[int] = (32, 16)
  attention_normalizer: str = 'softmax'
  # reference DIN score nets are plain DNNs whose hidden activation is
  # the config's (default tf.nn.relu), last layer linear
  # (multi_tower_din.py:82 last_layer_no_activation,
  # sequence_feature_layer.py din_layer)
  activation: str = 'relu'

  @nn.compact
  def __call__(self, query, keys, mask, training: bool = False, aux=()):
    # query [..., D], keys [..., L, D], mask [..., L] — extra leading
    # dims (e.g. per-sampled-negative queries [B, N, D]) broadcast through.
    # aux: extra [..., L, Da] value sequences attended with the SAME
    # weights, concatenated after the main output (reference
    # sequence_feature_layer aux_hist_seq handling).
    q = jnp.broadcast_to(query[..., None, :], keys.shape)
    att_in = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
    scores = DNN(hidden_units=tuple(self.attention_dims) + (1,),
                 activation=self.activation, use_bn=False,
                 use_final_activation=False,
                 name='att_dnn')(att_in, training)[..., 0]   # [..., L]
    if self.attention_normalizer == 'softmax':
      scores = jnp.where(mask > 0, scores, _NEG_INF)
      weights = nn.softmax(scores, axis=-1)
      weights = weights * (mask.sum(axis=-1, keepdims=True) > 0)
    else:  # sigmoid
      weights = nn.sigmoid(scores) * mask
    out = jnp.einsum('...l,...ld->...d', weights, keys)
    if aux:
      outs = [out] + [jnp.einsum('...l,...ld->...d', weights, a)
                      for a in aux]
      out = jnp.concatenate(outs, axis=-1)
    return out


class MultiHeadSelfAttention(nn.Module):
  """Multi-head self-attention over fields/steps with residual.

  AutoInt interacting layer (reference model/autoint.py:16): input
  [B, F, D] -> [B, F, num_heads * head_size].
  """
  num_heads: int
  head_size: int
  use_residual: bool = True

  @nn.compact
  def __call__(self, x, mask=None):
    d_out = self.num_heads * self.head_size
    q = nn.DenseGeneral((self.num_heads, self.head_size), axis=-1,
                        use_bias=False, name='q')(x)
    k = nn.DenseGeneral((self.num_heads, self.head_size), axis=-1,
                        use_bias=False, name='k')(x)
    v = nn.DenseGeneral((self.num_heads, self.head_size), axis=-1,
                        use_bias=False, name='v')(x)
    scores = jnp.einsum('bfhe,bghe->bhfg', q, k) / jnp.sqrt(
        float(self.head_size))
    if mask is not None:
      scores = jnp.where(mask[:, None, None, :] > 0, scores, _NEG_INF)
    probs = nn.softmax(scores, axis=-1)
    out = jnp.einsum('bhfg,bghe->bfhe', probs, v)
    out = out.reshape(out.shape[0], out.shape[1], d_out)
    if self.use_residual:
      res = nn.Dense(d_out, use_bias=False, name='res')(x) \
          if x.shape[-1] != d_out else x
      out = nn.relu(out + res)
    return out


def _attn_impl() -> str:
  import os
  return os.environ.get('EASYREC_ATTN_IMPL', 'vpu_bf16')


class PackedMHA(nn.Module):
  """Multi-head dot-product attention tuned for recsys shapes
  (L ~ 50, head_dim ~ 8), where the stock per-head batched matmuls
  ([L, Dh] @ [Dh, L] x B x H instances) are dispatch- and MXU-padding-
  bound: a K=8 contraction pads 16x on the 128x128 MXU and the B*H
  instance count dominates.

  Measured fwd+bwd of the attention core at BST bench shapes
  ([4096, 51, 32], 4 heads; benchmarks/bench_attention.py, v5e):

    stock per-head einsum    10.57 ms
    block-diag head packing  15.1-15.7 ms (expansion transposes lose)
    vpu multiply-reduce       8.11 ms
    vpu + bf16 payloads       7.41 ms   <- default

  The vpu formulation writes the K=8 contraction as a fused broadcast-
  multiply-reduce (no dot_general): XLA lowers it to one VPU reduce
  fusion per tensor, dodging both MXU K-padding and per-instance
  matmul dispatch. bf16 payloads halve the fused-loop reads; scores
  accumulate in f32 (sums of 8 products — bf16 rounding ~2^-8 on the
  inputs only; the BST learnability gates pass). EASYREC_ATTN_IMPL
  in {stock, vpu, vpu_bf16} selects the core at trace time.

  Parameter tree ('query'/'key'/'value'/'out' DenseGeneral) matches
  flax.linen.MultiHeadDotProductAttention, so swapping modules keeps
  checkpoints compatible; numerics parity vs flax is pinned by
  tests/test_backbone.py::test_packed_mha_matches_flax (stock impl
  exact; vpu impls identical up to payload rounding).
  """
  num_heads: int
  qkv_features: int
  out_features: int
  dropout_rate: float = 0.0
  deterministic: bool = True

  @nn.compact
  def __call__(self, x_q, x_kv, mask=None):
    h = self.num_heads
    dh = self.qkv_features // h
    q = nn.DenseGeneral((h, dh), axis=-1, name='query')(x_q)
    k = nn.DenseGeneral((h, dh), axis=-1, name='key')(x_kv)
    v = nn.DenseGeneral((h, dh), axis=-1, name='value')(x_kv)
    q = q / jnp.sqrt(jnp.asarray(dh, q.dtype))
    impl = _attn_impl()
    if impl == 'stock':
      s4 = jnp.einsum('blhd,bmhd->blhm', q, k)
    else:
      payload = jnp.bfloat16 if impl == 'vpu_bf16' else q.dtype
      qp, kp = q.astype(payload), k.astype(payload)
      # [B, L, M, H, Dh] product reduced over Dh, as one VPU fusion
      s4 = jnp.sum((qp[:, :, None, :, :] * kp[:, None, :, :, :])
                   .astype(jnp.float32),
                   axis=-1).transpose(0, 1, 3, 2)     # [B, L, H, M]
    if mask is not None:
      s4 = jnp.where(mask[:, None, None, :] > 0, s4, _NEG_INF)
    probs = nn.softmax(s4, axis=-1)
    if self.dropout_rate > 0.0:
      probs = nn.Dropout(self.dropout_rate,
                         deterministic=self.deterministic)(probs)
    if impl == 'stock':
      ctx = jnp.einsum('blhm,bmhd->blhd', probs, v)
    else:
      payload = jnp.bfloat16 if impl == 'vpu_bf16' else q.dtype
      pp = probs.astype(payload)
      vp = v.astype(payload).transpose(0, 2, 1, 3)    # [B, H, M, Dh]
      ctx = jnp.sum((pp[:, :, :, :, None] * vp[:, None, :, :, :])
                    .astype(jnp.float32), axis=3)     # [B, L, H, Dh]
    ctx = ctx.astype(x_q.dtype)
    return nn.DenseGeneral(self.out_features, axis=(-2, -1),
                           name='out')(ctx)


class TransformerBlock(nn.Module):
  """Transformer encoder block (BST flavor, reference
  layers/keras/bst.py + multihead_cross_attention transformer_encoder).

  pre_ln=False matches the reference post-LN layout; pre_ln=True is an
  easyrec_tpu extension (LN before each sub-layer, residual outside)
  that stays stable at learning rates where post-LN stalls — the
  standard pre-norm transformer robustness result."""
  hidden_size: int
  num_heads: int
  intermediate_size: int
  hidden_act: str = 'gelu'
  hidden_dropout: float = 0.1
  attention_dropout: float = 0.1
  pre_ln: bool = False

  @nn.compact
  def __call__(self, x, mask, training: bool = False):
    a_in = nn.LayerNorm(name='ln1')(x) if self.pre_ln else x
    att = PackedMHA(
        num_heads=self.num_heads,
        qkv_features=self.hidden_size,
        out_features=self.hidden_size,
        dropout_rate=self.attention_dropout,
        deterministic=not training,
        name='mha')(a_in, a_in, mask=mask)
    att = nn.Dropout(self.hidden_dropout, deterministic=not training)(att)
    if self.pre_ln:
      x = x + att
      f_in = nn.LayerNorm(name='ln2')(x)
    else:
      x = nn.LayerNorm(name='ln1')(x + att)
      f_in = x
    act = get_activation(self.hidden_act)
    ffn = nn.Dense(self.intermediate_size, name='ffn1')(f_in)
    ffn = act(ffn)
    ffn = nn.Dense(self.hidden_size, name='ffn2')(ffn)
    ffn = nn.Dropout(self.hidden_dropout, deterministic=not training)(ffn)
    if self.pre_ln:
      return x + ffn
    return nn.LayerNorm(name='ln2')(x + ffn)


class BSTEncoder(nn.Module):
  """Behavior-sequence transformer: target item + history sequence through
  transformer blocks, output flattened valid positions (reference
  model/multi_tower_bst.py, layers/keras/bst.py).
  """
  hidden_size: int
  num_layers: int = 1
  num_heads: int = 4
  intermediate_size: int = 128
  max_position: int = 512
  use_position: bool = True
  hidden_dropout: float = 0.1
  attention_dropout: float = 0.1
  output_all_tokens: bool = False
  # where the target token sits in the sequence: 'head' | 'tail' | ''
  # (reference layers/keras/bst.py target_item_position); when no
  # target is given, reserve_target_position keeps its position slot
  target_item_position: str = 'head'
  reserve_target_position: bool = True
  pre_ln: bool = False

  @nn.compact
  def __call__(self, seq, mask, target=None, training: bool = False):
    # seq [B, L, D], optional target [B, D] at head or tail
    x = nn.Dense(self.hidden_size, name='input_proj')(seq)
    tgt_idx = 0
    if target is not None and self.target_item_position in ('head',
                                                            'tail'):
      t = nn.Dense(self.hidden_size, name='target_proj')(target)
      ones = jnp.ones((mask.shape[0], 1), mask.dtype)
      if self.target_item_position == 'tail':
        x = jnp.concatenate([x, t[:, None, :]], axis=1)
        mask = jnp.concatenate([mask, ones], axis=1)
        tgt_idx = x.shape[1] - 1
      else:
        x = jnp.concatenate([t[:, None, :], x], axis=1)
        mask = jnp.concatenate([ones, mask], axis=1)
    if self.use_position:
      L = x.shape[1]
      start = 1 if (target is None and self.reserve_target_position
                    and self.target_item_position == 'head') else 0
      # the prepended target consumes a position slot, so the table may
      # need one row beyond max_position (L is static at trace time)
      rows = max(self.max_position, L + start)
      pos = self.param('position_emb', nn.initializers.normal(0.02),
                       (rows, self.hidden_size))
      x = x + pos[None, start:start + L, :]
    # reference embedding_postprocessor ends with layer_norm_and_dropout
    # (multihead_cross_attention.py:768); measured on the sequence
    # learnability gate it also moves the lr-0.02 plateau 0.72 -> 0.78
    x = nn.LayerNorm(name='emb_ln')(x)
    x = nn.Dropout(self.hidden_dropout, deterministic=not training)(x)
    for i in range(self.num_layers):
      x = TransformerBlock(
          hidden_size=self.hidden_size, num_heads=self.num_heads,
          intermediate_size=self.intermediate_size,
          hidden_dropout=self.hidden_dropout,
          attention_dropout=self.attention_dropout,
          pre_ln=self.pre_ln,
          name='block_%d' % i)(x, mask, training)
    if self.pre_ln:
      x = nn.LayerNorm(name='final_ln')(x)   # standard pre-norm cap
    x = x * mask[:, :, None]
    if self.output_all_tokens:
      return x.reshape(x.shape[0], -1)
    return x[:, tgt_idx, :]
