"""Layer registry for the backbone DSL: KerasLayer.class_name -> flax
module builder.

Mirrors the reference's name-based reflection instantiation
(easy_rec/python/utils/load_class.py:225 load_keras_layer +
layers/keras/__init__.py registry). Each builder consumes a Parameter
view (typed proto oneof or free-form st_params Struct) and returns a
configured nn.Module whose __call__ takes (inputs, training).
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

from easyrec_tpu.layers import blocks as B
from easyrec_tpu.layers import fibinet as FB
from easyrec_tpu.layers import interaction as IX
from easyrec_tpu.layers import numeric_embedding as NE
from easyrec_tpu.layers.attention import (BSTEncoder, DinAttention,
                                          MultiHeadSelfAttention,
                                          TransformerBlock)
from easyrec_tpu.layers.dnn import MLP, Highway
from easyrec_tpu.layers.param import Parameter

_BUILDERS: Dict[str, Callable] = {}


def register_layer(*names: str):
  def deco(fn):
    for n in names:
      _BUILDERS[n.lower()] = fn
    return fn
  return deco


def has_layer(class_name: str) -> bool:
  return class_name.lower() in _BUILDERS


def build_keras_layer(keras_layer_pb, name: str) -> nn.Module:
  """Instantiate a backbone layer from its KerasLayer proto."""
  cls = keras_layer_pb.class_name
  key = cls.lower()
  if key not in _BUILDERS:
    raise ValueError('unknown keras layer class %r; known: %s' %
                     (cls, sorted(_BUILDERS)))
  params = Parameter.from_keras_layer(keras_layer_pb)
  return _BUILDERS[key](params, name)


# --------------------------------------------------------------------------
# uniform-call adapters for layers with structured inputs
# --------------------------------------------------------------------------


class _SingleInput(nn.Module):
  """Adapts a tensor-only module to the (inputs, training) convention,
  concatenating list inputs along the last axis."""
  inner: nn.Module
  takes_training: bool = False

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    x = inputs
    if isinstance(x, (list, tuple)):
      x = jnp.concatenate([v for v in x], axis=-1) if len(x) > 1 else x[0]
    if self.takes_training:
      return self.inner(x, training)
    return self.inner(x)


class _DINAdapter(nn.Module):
  """[seq, mask, query] -> DIN target attention output [B, D]."""
  attention_dims: tuple
  attention_normalizer: str = 'softmax'
  activation: str = 'relu'
  need_target_feature: bool = True

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    seq, mask = inputs[0], inputs[1]
    if self.need_target_feature and len(inputs) > 2:
      query = inputs[2]
    else:
      # no target: mean-pool the sequence as the query
      denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
      query = (seq * mask[:, :, None]).sum(axis=1) / denom
    if query.shape[-1] != seq.shape[-1]:
      query = nn.Dense(seq.shape[-1], name='query_proj')(query)
    return DinAttention(attention_dims=self.attention_dims,
                        attention_normalizer=self.attention_normalizer,
                        activation=self.activation,
                        name='din')(query, seq, mask, training)


class _BSTAdapter(nn.Module):
  """[seq, mask(, target)] -> BST transformer encoding."""
  hidden_size: int
  num_layers: int
  num_heads: int
  intermediate_size: int
  max_position: int = 512
  use_position: bool = True
  hidden_dropout: float = 0.1
  attention_dropout: float = 0.1
  output_all_tokens: bool = False
  target_item_position: str = 'head'
  reserve_target_position: bool = True
  pre_ln: bool = False

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    seq, mask = inputs[0], inputs[1]
    target = inputs[2] if len(inputs) > 2 else None
    return BSTEncoder(
        hidden_size=self.hidden_size, num_layers=self.num_layers,
        num_heads=self.num_heads,
        intermediate_size=self.intermediate_size,
        max_position=self.max_position, use_position=self.use_position,
        hidden_dropout=self.hidden_dropout,
        attention_dropout=self.attention_dropout,
        output_all_tokens=self.output_all_tokens,
        target_item_position=self.target_item_position,
        reserve_target_position=self.reserve_target_position,
        pre_ln=self.pre_ln,
        name='bst')(seq, mask, target, training)


class _MHAAdapter(nn.Module):
  """Self-attention over [B, F/L, D] (optionally masked)."""
  num_heads: int
  key_dim: int

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    if isinstance(inputs, (list, tuple)):
      x, mask = inputs[0], inputs[1]
    else:
      x, mask = inputs, None
    return MultiHeadSelfAttention(num_heads=self.num_heads,
                                  head_size=self.key_dim,
                                  name='mha')(x, mask)


class _DotAttention(nn.Module):
  """keras.layers.Attention-style dot attention over [query, value(, key)]."""
  use_scale: bool = False
  scale_by_dim: bool = False

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    q = inputs[0]
    v = inputs[1] if len(inputs) > 1 else q
    k = inputs[2] if len(inputs) > 2 else v
    scores = jnp.einsum('bqd,bkd->bqk', q, k)
    if self.use_scale:
      scale = self.param('scale', nn.initializers.ones, ())
      scores = scores * scale
    elif self.scale_by_dim:
      scores = scores / jnp.sqrt(float(q.shape[-1]))
    w = nn.softmax(scores, axis=-1)
    return jnp.einsum('bqk,bkd->bqd', w, v)


class _TransformerAdapter(nn.Module):
  """Token-id transformer encoder (vocab embed + blocks)."""
  hidden_size: int
  num_layers: int
  num_heads: int
  intermediate_size: int
  vocab_size: int = 0
  max_position: int = 512
  use_position: bool = False
  hidden_dropout: float = 0.1
  output_all_tokens: bool = True

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    if isinstance(inputs, (list, tuple)):
      x, mask = inputs[0], inputs[1]
    else:
      x, mask = inputs, None
    if x.ndim == 2 and self.vocab_size:     # token ids
      x = nn.Embed(self.vocab_size, self.hidden_size, name='tok_emb')(
          x.astype(jnp.int32))
    elif x.shape[-1] != self.hidden_size:
      x = nn.Dense(self.hidden_size, name='input_proj')(x)
    if mask is None:
      mask = jnp.ones(x.shape[:2], x.dtype)
    if self.use_position:
      pos = self.param('position_emb', nn.initializers.normal(0.02),
                       (self.max_position, self.hidden_size))
      x = x + pos[None, :x.shape[1], :]
    for i in range(self.num_layers):
      x = TransformerBlock(hidden_size=self.hidden_size,
                           num_heads=self.num_heads,
                           intermediate_size=self.intermediate_size,
                           hidden_dropout=self.hidden_dropout,
                           name='block_%d' % i)(x, mask, training)
    x = x * mask[:, :, None]
    if self.output_all_tokens:
      return x
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    return x.sum(axis=1) / denom


class _MMoEAdapter(nn.Module):
  """Backbone MMoE layer: returns a LIST of per-task mixtures."""
  num_task: int
  num_expert: int
  expert_hidden_units: tuple

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    from easyrec_tpu.layers.multi_task import MMoE
    x = inputs
    if isinstance(x, (list, tuple)):
      x = jnp.concatenate(x, axis=-1) if len(x) > 1 else x[0]
    return MMoE(num_task=self.num_task, num_expert=self.num_expert,
                expert_hidden_units=self.expert_hidden_units,
                name='mmoe')(x, training)


# --------------------------------------------------------------------------
# builders
# --------------------------------------------------------------------------


def _mlp_units(p: Parameter):
  return tuple(int(u) for u in p.get_list('hidden_units'))


@register_layer('MLP')
def _build_mlp(p: Parameter, name: str):
  return MLP(hidden_units=_mlp_units(p),
             activation=p.get_str('activation', 'relu'),
             use_bn=p.get_bool('use_bn', True),
             use_final_bn=p.get_bool('use_final_bn', True),
             final_activation=p.get_str('final_activation', 'relu'),
             use_bias=p.get_bool('use_bias', False),
             dropout_ratio=tuple(p.get_list('dropout_ratio')),
             use_final_bias=p.get_bool('use_final_bias', False),
             use_bn_after_activation=p.get_bool('use_bn_after_activation',
                                                False),
             kernel_initializer=p.get_str('initializer', 'he_uniform'),
             name=name)


@register_layer('Highway', 'HighWayTower')
def _build_highway(p: Parameter, name: str):
  inner = Highway(emb_size=p.get_int('emb_size', 64),
                  activation=p.get_str('activation', 'relu'),
                  dropout_rate=p.get_float('dropout_rate', 0.0),
                  init_gate_bias=p.get_float('init_gate_bias', -3.0),
                  num_layers=p.get_int('num_layers', 1))
  return _SingleInput(inner=inner, takes_training=True, name=name)


@register_layer('Gate', 'WeightedGate')
def _build_gate(p: Parameter, name: str):
  mlp = p.get_pb('mlp')
  units = tuple(int(u) for u in mlp.hidden_units) if mlp is not None else ()
  return B.Gate(weight_index=p.get_int('weight_index', 0),
                mlp_hidden_units=units, name=name)


@register_layer('PPNet')
def _build_ppnet(p: Parameter, name: str):
  mlp = p.get_pb('mlp')
  gate = p.get_pb('gate_params')
  units = tuple(int(u) for u in mlp.hidden_units) if mlp is not None else ()
  dropout = tuple(mlp.dropout_ratio) if mlp is not None else ()
  gate_hidden = 0
  if gate is not None:
    gate_hidden = int(getattr(gate, 'hidden_dim', 0) or 0)
  return B.PPNet(hidden_units=units, gate_hidden_dim=gate_hidden,
                 dropout_ratio=dropout,
                 mode=p.get_str('mode', 'eager'),
                 full_gate_input=p.get_bool('full_gate_input', True),
                 name=name)


@register_layer('TextCNN')
def _build_textcnn(p: Parameter, name: str):
  mlp = p.get_pb('mlp')
  units = tuple(int(u) for u in mlp.hidden_units) if mlp is not None else ()
  return B.TextCNN(
      filter_sizes=tuple(int(v) for v in p.get_list('filter_sizes',
                                                    (2, 3, 4))),
      num_filters=tuple(int(v) for v in p.get_list('num_filters',
                                                   (128, 64, 64))),
      activation=p.get_str('activation', 'relu'),
      mlp_hidden_units=units, name=name)


@register_layer('PeriodicEmbedding')
def _build_periodic(p: Parameter, name: str):
  return NE.PeriodicEmbedding(
      embedding_dim=p.get_int('embedding_dim', 16),
      sigma=p.get_float('sigma', 1.0),
      add_linear_layer=p.get_bool('add_linear_layer', True),
      linear_activation=p.get_str('linear_activation', 'relu'),
      output_3d_tensor=p.get_bool('output_3d_tensor', False),
      output_tensor_list=p.get_bool('output_tensor_list', False),
      name=name)


@register_layer('AutoDisEmbedding')
def _build_autodis(p: Parameter, name: str):
  return NE.AutoDisEmbedding(
      embedding_dim=p.get_int('embedding_dim', 16),
      num_bins=p.get_int('num_bins', 16),
      temperature=p.get_float('temperature', 1.0),
      keep_prob=p.get_float('keep_prob', 0.8),
      output_3d_tensor=p.get_bool('output_3d_tensor', False),
      output_tensor_list=p.get_bool('output_tensor_list', False),
      name=name)


@register_layer('NaryDisEmbedding')
def _build_narydis(p: Parameter, name: str):
  return NE.NaryDisEmbedding(
      embedding_dim=p.get_int('embedding_dim', 16),
      carries=tuple(int(c) for c in p.get_list('carries', (2, 9))),
      multiplier=p.get_float('multiplier', 1.0),
      intra_ary_pooling=p.get_str('intra_ary_pooling', 'sum'),
      inter_ary_pooling=p.get_str('inter_ary_pooling', 'concat'),
      output_3d_tensor=p.get_bool('output_3d_tensor', False),
      output_tensor_list=p.get_bool('output_tensor_list', False),
      name=name)


@register_layer('SENet')
def _build_senet(p: Parameter, name: str):
  inner = FB.SENet(
      reduction_ratio=p.get_int('reduction_ratio', 4),
      num_squeeze_group=p.get_int('num_squeeze_group', 2),
      use_skip_connection=p.get_bool('use_skip_connection', True),
      use_output_layer_norm=p.get_bool('use_output_layer_norm', True))
  return _FieldsInput(inner=inner, name=name)


@register_layer('BiLinear', 'Bilinear')
def _build_bilinear(p: Parameter, name: str):
  inner = FB.Bilinear(type=p.get_str('type', 'interaction'),
                      use_plus=p.get_bool('use_plus', True),
                      num_output_units=p.get_int('num_output_units', 0))
  return _SingleInput(inner=inner, name=name)


@register_layer('FiBiNet')
def _build_fibinet(p: Parameter, name: str):
  senet = p.get_pb('senet')
  bilinear = p.get_pb('bilinear')
  mlp = p.get_pb('mlp')
  inner = FB.FiBiNet(
      senet_reduction_ratio=int(senet.reduction_ratio) if senet else 4,
      senet_num_squeeze_group=int(senet.num_squeeze_group) if senet else 2,
      bilinear_type=str(bilinear.type) if bilinear else 'interaction',
      bilinear_output_units=int(bilinear.num_output_units)
      if bilinear else 0,
      mlp_hidden_units=tuple(mlp.hidden_units) if mlp else ())
  return _SingleInput(inner=inner, takes_training=True, name=name)


@register_layer('MaskBlock')
def _build_maskblock(p: Parameter, name: str):
  class _MaskBlockSelf(nn.Module):
    output_size: int
    reduction_factor: float
    input_layer_norm: bool

    @nn.compact
    def __call__(self, inputs, training: bool = False):
      x = inputs
      if isinstance(x, (list, tuple)):
        # [hidden, mask_input]
        return FB.MaskBlock(output_size=self.output_size,
                            reduction_factor=self.reduction_factor,
                            input_layer_norm=self.input_layer_norm,
                            name='mb')(x[0], x[1])
      return FB.MaskBlock(output_size=self.output_size,
                          reduction_factor=self.reduction_factor,
                          input_layer_norm=self.input_layer_norm,
                          name='mb')(x, x)
  return _MaskBlockSelf(output_size=p.get_int('output_size', 64),
                        reduction_factor=p.get_float('reduction_factor',
                                                     1.0),
                        input_layer_norm=p.get_bool('input_layer_norm',
                                                    False),
                        name=name)


@register_layer('MaskNet')
def _build_masknet(p: Parameter, name: str):
  mlp = p.get_pb('mlp')
  sizes, reds = [], []
  if p.is_struct:
    for blk in p.get_list('mask_blocks'):
      sizes.append(int(blk.get('output_size', 64)))
      reds.append(float(blk.get('reduction_factor', 1.0)))
  else:
    for blk in p.get('mask_blocks'):
      sizes.append(int(blk.output_size) or 64)
      reds.append(float(blk.reduction_factor) or 1.0)
  inner = FB.MaskNet(
      block_output_sizes=tuple(sizes) or (64, 64),
      block_reduction_factors=tuple(reds),
      use_parallel=p.get_bool('use_parallel', True),
      mlp_hidden_units=tuple(mlp.hidden_units) if mlp else (),
      input_layer_norm=p.get_bool('input_layer_norm', True))
  return _SingleInput(inner=inner, takes_training=True, name=name)


class _FMAdapter(nn.Module):
  """FM input: a list of same-dim [B, D] tensors (stacked to [B, F, D],
  reference keras/interaction.py:24-33) or a 3d [B, F, D] tensor."""
  use_variant: bool = False

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    x = inputs
    if isinstance(x, (list, tuple)):
      dims = {int(v.shape[-1]) for v in x}
      if len(dims) != 1:
        raise ValueError('all embedding dims must be equal in FM layer: '
                         '%s' % sorted(dims))
      x = jnp.stack(list(x), axis=1)
    if x.ndim != 3:
      raise ValueError('input of FM layer must be a 3d tensor or a list '
                       'of 2d tensors, got shape %s' % (x.shape,))
    return IX.FM(use_variant=self.use_variant)(x)


@register_layer('FM')
def _build_fm(p: Parameter, name: str):
  return _FMAdapter(use_variant=p.get_bool('use_variant', False),
                    name=name)


class _CrossAdapter(nn.Module):
  """DCN-v2 Cross: a single tensor runs num_layers steps from x0; a
  two-element list is the recurrent-block convention [x0, x_l] (one
  shared-parameter step per call, reference dcn_backbone pattern)."""
  num_layers: int = 1
  projection_dim: int = 0

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    inner = IX.CrossNetV2(num_layers=self.num_layers,
                          projection_dim=self.projection_dim)
    if isinstance(inputs, (list, tuple)) and len(inputs) == 2:
      x0, x = inputs
      if x0.shape[-1] != x.shape[-1]:
        raise ValueError(
            'Cross with two inputs is the [x0, x_l] pair convention '
            '(reference dcn_backbone recurrent pattern) and needs equal '
            'dims, got %d vs %d; concatenate the inputs into one block '
            'first if you want a plain cross over their concat'
            % (x0.shape[-1], x.shape[-1]))
      return inner(x0, x)
    if isinstance(inputs, (list, tuple)):
      inputs = jnp.concatenate(list(inputs), axis=-1) \
          if len(inputs) > 1 else inputs[0]
    return inner(inputs)


@register_layer('Cross')
def _build_cross(p: Parameter, name: str):
  # DCN-v2 cross layer (keras Cross); low_rank via projection_dim
  return _CrossAdapter(num_layers=p.get_int('num_layers', 1) or 1,
                       projection_dim=p.get_int('projection_dim', 0),
                       name=name)


@register_layer('CIN')
def _build_cin(p: Parameter, name: str):
  sizes = tuple(int(v) for v in p.get_list('hidden_feature_sizes',
                                           (128, 128)))
  inner = IX.CIN(hidden_feature_sizes=sizes)
  return _SingleInput(inner=inner, name=name)


class _FieldsInput(nn.Module):
  """Adapter for field-interaction layers whose reference forms accept
  EITHER a [B, F, D] tensor or a LIST of per-field [B, D] tensors
  (e.g. DotInteraction fed `[bottom_mlp] + feature_list`, SENet fed an
  only_output_feature_list block) — stack lists on a new field axis."""
  inner: nn.Module

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    x = inputs
    if isinstance(x, (list, tuple)):
      if len(x) == 1 and getattr(x[0], 'ndim', 2) == 3:
        x = x[0]
      else:
        flat = []
        for v in x:
          # 3-D members (an already-stacked block merged with a feature
          # list) contribute their fields individually
          if v.ndim == 3:
            flat.extend(jnp.moveaxis(v, 1, 0))
          else:
            flat.append(v)
        x = jnp.stack(flat, axis=1)
    return self.inner(x)


@register_layer('DotInteraction')
def _build_dot_interaction(p: Parameter, name: str):
  inner = IX.DotInteraction(
      self_interaction=p.get_bool('self_interaction', False))
  return _FieldsInput(inner=inner, name=name)


@register_layer('MMoE')
def _build_mmoe(p: Parameter, name: str):
  mlp = p.get_pb('expert_mlp')
  units = tuple(mlp.hidden_units) if mlp is not None else (64,)
  return _MMoEAdapter(num_task=p.get_int('num_task', 2),
                      num_expert=p.get_int('num_expert', 4),
                      expert_hidden_units=units, name=name)


@register_layer('AITMTower', 'AITM')
def _build_aitm(p: Parameter, name: str):
  mlp = p.get_pb('transfer_mlp')
  units = tuple(mlp.hidden_units) if mlp is not None else ()
  return B.AITMTower(project_dim=p.get_int('project_dim', 0),
                     transfer_hidden_units=units,
                     stop_gradient=p.get_bool('stop_gradient', True),
                     name=name)


@register_layer('DIN', 'DINEncoder')
def _build_din(p: Parameter, name: str):
  dnn = p.get_pb('attention_dnn')
  dims = tuple(dnn.hidden_units) if dnn is not None else (32, 16)
  return _DINAdapter(attention_dims=dims,
                     attention_normalizer=p.get_str(
                         'attention_normalizer', 'softmax'),
                     activation=(dnn.activation or 'relu')
                     if dnn is not None else 'relu',
                     need_target_feature=p.get_bool('need_target_feature',
                                                    True),
                     name=name)


@register_layer('BST', 'BSTEncoder')
def _build_bst(p: Parameter, name: str):
  return _BSTAdapter(
      hidden_size=p.get_int('hidden_size', 64),
      num_layers=p.get_int('num_hidden_layers', 1),
      num_heads=p.get_int('num_attention_heads', 4),
      intermediate_size=p.get_int('intermediate_size', 128),
      max_position=p.get_int('max_position_embeddings', 512),
      use_position=p.get_bool('use_position_embeddings', True),
      hidden_dropout=p.get_float('hidden_dropout_prob', 0.1),
      attention_dropout=p.get_float('attention_probs_dropout_prob', 0.1),
      output_all_tokens=p.get_bool('output_all_token_embeddings', False),
      target_item_position=p.get_str('target_item_position', 'head'),
      reserve_target_position=p.get_bool('reserve_target_position', True),
      pre_ln=p.get_bool('pre_ln', False),
      name=name)


@register_layer('Attention')
def _build_attention(p: Parameter, name: str):
  return _DotAttention(use_scale=p.get_bool('use_scale', False),
                       scale_by_dim=p.get_bool('scale_by_dim', False),
                       name=name)


@register_layer('MultiHeadAttention')
def _build_mha(p: Parameter, name: str):
  return _MHAAdapter(num_heads=p.get_int('num_heads', 4),
                     key_dim=p.get_int('key_dim', 16), name=name)


@register_layer('Transformer', 'TransformerEncoder', 'TransformerBlock',
                'TextEncoder')
def _build_transformer(p: Parameter, name: str):
  tr = p.get_pb('transformer')
  src = Parameter(tr, False) if tr is not None else p
  return _TransformerAdapter(
      hidden_size=src.get_int('hidden_size', 64),
      num_layers=src.get_int('num_hidden_layers', 1),
      num_heads=src.get_int('num_attention_heads', 4),
      intermediate_size=src.get_int('intermediate_size', 128),
      vocab_size=src.get_int('vocab_size', 0),
      max_position=src.get_int('max_position_embeddings', 512),
      use_position=src.get_bool('use_position_embeddings', False),
      hidden_dropout=src.get_float('hidden_dropout_prob', 0.1),
      output_all_tokens=src.get_bool('output_all_token_embeddings', True),
      name=name)


@register_layer('SeqAugment', 'SeqAugmentOps')
def _build_seq_augment(p: Parameter, name: str):
  return B.SeqAugment(mask_rate=p.get_float('mask_rate', 0.6),
                      crop_rate=p.get_float('crop_rate', 0.2),
                      reorder_rate=p.get_float('reorder_rate', 0.6),
                      name=name)


@register_layer('AuxiliaryLoss')
def _build_aux_loss(p: Parameter, name: str):
  return B.AuxiliaryLoss(loss_type=p.get_str('loss_type', 'l2_loss'),
                         loss_weight=p.get_float('loss_weight', 1.0),
                         temperature=p.get_float('temperature', 0.1),
                         name=name)


@register_layer('EinsumDense')
def _build_einsum_dense(p: Parameter, name: str):
  return B.EinsumDense(
      equation=p.get_str('equation', 'bd,de->be'),
      output_shape=tuple(int(v) for v in p.get_list('output_shape', (64,))),
      activation=p.get_str('activation', ''),
      bias_axes=p.get_str('bias_axes', ''), name=name)


@register_layer('LayerNorm', 'LayerNormalization')
def _build_layer_norm(p: Parameter, name: str):
  return B.LayerNorm(name=name)


@register_layer('Dropout')
def _build_dropout(p: Parameter, name: str):
  class _Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, training: bool = False):
      return nn.Dropout(self.rate, deterministic=not training)(x)
  return _Dropout(rate=p.get_float('rate', 0.5), name=name)


# --------------------------------------------------------------------------
# tf.keras fallback names: the reference resolves unknown class_names via
# tf.keras.layers reflection (utils/load_class.py:225), and shipped configs
# use 'Dense' / 'Add' / 'Dropout' etc. directly — mirror the common ones.
# --------------------------------------------------------------------------


@register_layer('Dense')
def _build_dense(p: Parameter, name: str):
  from easyrec_tpu.layers.dnn import get_activation

  class _Dense(nn.Module):
    units: int
    activation: str = ''
    use_bias: bool = True

    @nn.compact
    def __call__(self, inputs, training: bool = False):
      x = inputs
      if isinstance(x, (list, tuple)):
        x = jnp.concatenate(list(x), axis=-1) if len(x) > 1 else x[0]
      x = nn.Dense(self.units, use_bias=self.use_bias)(x)
      if self.activation:
        x = get_activation(self.activation)(x)
      return x
  return _Dense(units=p.get_int('units', 64),
                activation=p.get_str('activation', ''),
                use_bias=p.get_bool('use_bias', True), name=name)


class _ListCombine(nn.Module):
  """Element-wise combine of a list of same-shaped tensors."""
  mode: str = 'add'

  @nn.compact
  def __call__(self, inputs, training: bool = False):
    xs = inputs if isinstance(inputs, (list, tuple)) else [inputs]
    if self.mode == 'concat':
      return jnp.concatenate(list(xs), axis=-1) if len(xs) > 1 else xs[0]
    out = xs[0]
    for v in xs[1:]:
      out = out + v if self.mode == 'add' else out * v
    return out


@register_layer('Add')
def _build_add(p: Parameter, name: str):
  return _ListCombine(mode='add', name=name)


@register_layer('Multiply')
def _build_multiply(p: Parameter, name: str):
  return _ListCombine(mode='multiply', name=name)


@register_layer('Concatenate')
def _build_concatenate(p: Parameter, name: str):
  return _ListCombine(mode='concat', name=name)


@register_layer('Flatten')
def _build_flatten(p: Parameter, name: str):
  class _Flatten(nn.Module):
    @nn.compact
    def __call__(self, inputs, training: bool = False):
      x = inputs
      if isinstance(x, (list, tuple)):
        x = jnp.concatenate([v.reshape(v.shape[0], -1) for v in x], -1)
      return x.reshape(x.shape[0], -1)
  return _Flatten(name=name)


@register_layer('BatchNormalization', 'BatchNorm')
def _build_batch_norm(p: Parameter, name: str):
  class _BN(nn.Module):
    momentum: float = 0.99

    @nn.compact
    def __call__(self, inputs, training: bool = False):
      x = inputs
      if isinstance(x, (list, tuple)):
        x = jnp.concatenate(list(x), axis=-1) if len(x) > 1 else x[0]
      return nn.BatchNorm(use_running_average=not training,
                          momentum=self.momentum)(x)
  return _BN(momentum=p.get_float('momentum', 0.99), name=name)


@register_layer('Dice')
def _build_dice(p: Parameter, name: str):
  from easyrec_tpu.layers.dnn import Dice
  return _SingleInput(inner=Dice(), takes_training=True, name=name)


@register_layer('GateNN')
def _build_gate_nn(p: Parameter, name: str):
  class _GateNN(nn.Module):
    output_dim: int
    hidden_dim: int
    activation: str
    dropout_rate: float

    @nn.compact
    def __call__(self, inputs, training: bool = False):
      x = inputs
      if isinstance(x, (list, tuple)):
        x = jnp.concatenate(list(x), axis=-1) if len(x) > 1 else x[0]
      return B.GateNN(output_dim=self.output_dim or x.shape[-1],
                      hidden_dim=self.hidden_dim,
                      activation=self.activation,
                      dropout_rate=self.dropout_rate,
                      name='gate_nn')(x, training)
  return _GateNN(output_dim=p.get_int('output_dim', 0),
                 hidden_dim=p.get_int('hidden_dim', 0),
                 activation=p.get_str('activation', 'relu'),
                 dropout_rate=p.get_float('dropout_rate', 0.0), name=name)
