"""Ranking model zoo: DeepFM, WideAndDeep, MultiTower(+DIN/BST), DCN,
AutoInt, DLRM, FM, DummyModel.

Reference implementations: easy_rec/python/model/{deepfm,wide_and_deep,
multi_tower,multi_tower_din,multi_tower_bst,dcn,autoint,dlrm,fm,
dummy_model}.py. Re-designed around the fused embedding pull: each module
receives (batch, pulled, training) and assembles its groups via the shared
InputLayer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.attention import (BSTEncoder, DinAttention,
                                          MultiHeadSelfAttention)
from easyrec_tpu.layers.dnn import DNN
from easyrec_tpu.layers.interaction import FM as FMLayer
from easyrec_tpu.layers.interaction import CrossNet, DotInteraction
from easyrec_tpu.models.base import ModelContext, RankModel, register_model
from easyrec_tpu.models.seq_input import group_input, seq_group_tensors


def _final_logits(x, n, name='logits'):
  return nn.Dense(n, name=name)(x)


class _DeepFMModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.deepfm
    deep_names = ctx.group_features('deep')
    wide_names = ctx.group_features('wide') if 'wide' in ctx.groups \
        else deep_names

    # wide part: sum of wide embeddings (dim == num_logits)
    wide = il.wide_logits(pulled, batch, wide_names)

    # fm over embedding fields (equal dims required)
    fm_in = il.group_stack(pulled, batch, [
        f for f in deep_names
        if ctx.specs[f].kind == 'categorical'])
    fm_out = FMLayer(use_variant=True, name='fm')(fm_in)

    # deep tower (group-level sequence_features attended in)
    deep_in = group_input(ctx, pulled, batch, 'deep', training) \
        if 'deep' in ctx.groups else il.group_concat(pulled, batch,
                                                     deep_names)
    deep_out = DNN.from_config(cfg.dnn, name='dnn',
                               compute_dtype=ctx.compute_dtype)(
                                   deep_in, training)

    if cfg.HasField('final_dnn') and len(cfg.final_dnn.hidden_units):
      all_in = jnp.concatenate([wide, fm_out, deep_out], axis=1)
      final = DNN.from_config(cfg.final_dnn, name='final_dnn',
                              compute_dtype=ctx.compute_dtype)(
                                  all_in, training)
      logits = _final_logits(final, self.num_logits)
    else:
      logits = _final_logits(
          jnp.concatenate([fm_out, deep_out], axis=1), self.num_logits)
      # wide is [B, wide_dim]: add per-class when dims align, else the
      # summed scalar (reference adds the wide output element-wise)
      logits = logits + (wide if wide.shape[-1] == logits.shape[-1]
                         else jnp.sum(wide, axis=1, keepdims=True))
    return {'raw_logits': logits}


@register_model('DeepFM')
class DeepFM(RankModel):
  """reference: model/deepfm.py:16"""

  def __init__(self, ctx: ModelContext):
    super().__init__(ctx)
    self.wide_output_dim = int(ctx.model_config.deepfm.wide_output_dim) or 1

  def make_module(self):
    return _WithPrediction(self, _DeepFMModule(self.ctx, self.logits_dim()))


class _WideAndDeepModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.wide_and_deep
    deep_names = ctx.group_features('deep')
    wide_names = ctx.group_features('wide')
    wide = il.wide_logits(pulled, batch, wide_names)
    deep_in = group_input(ctx, pulled, batch, 'deep', training) \
        if 'deep' in ctx.groups else il.group_concat(pulled, batch,
                                                     deep_names)
    deep = DNN.from_config(cfg.dnn, name='dnn',
                           compute_dtype=ctx.compute_dtype)(deep_in,
                                                            training)
    if cfg.HasField('final_dnn') and len(cfg.final_dnn.hidden_units):
      final_in = jnp.concatenate([wide, deep], axis=1)
      final = DNN.from_config(cfg.final_dnn, name='final_dnn',
                              compute_dtype=ctx.compute_dtype)(
                                  final_in, training)
      logits = _final_logits(final, self.num_logits)
    else:
      base = _final_logits(deep, self.num_logits)
      logits = base + (wide if wide.shape[-1] == base.shape[-1]
                       else jnp.sum(wide, axis=1, keepdims=True))
    return {'raw_logits': logits}


@register_model('WideAndDeep')
class WideAndDeep(RankModel):
  """reference: model/wide_and_deep.py:16"""

  def __init__(self, ctx):
    super().__init__(ctx)
    self.wide_output_dim = \
        int(ctx.model_config.wide_and_deep.wide_output_dim) or 1

  def make_module(self):
    return _WithPrediction(self,
                           _WideAndDeepModule(self.ctx, self.logits_dim()))


class _MultiTowerModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.multi_tower
    tower_outs = []
    from easyrec_tpu.models.seq_input import group_input_fn
    gi = group_input_fn(ctx, pulled, batch, training)
    for tower in cfg.towers:
      x = gi(tower.input)
      tower_outs.append(
          DNN.from_config(tower.dnn, name='tower_%s' % tower.input,
                          compute_dtype=ctx.compute_dtype)(x, training))
    for din_tower in cfg.din_towers:
      tower_outs.append(self._din_tower(din_tower, batch, pulled, training))
    for bst_tower in cfg.bst_towers:
      tower_outs.append(self._bst_tower(bst_tower, batch, pulled, training))
    all_in = jnp.concatenate(tower_outs, axis=1)
    final = DNN.from_config(cfg.final_dnn, name='final_dnn',
                            compute_dtype=ctx.compute_dtype)(all_in,
                                                             training)
    return {'raw_logits': _final_logits(final, self.num_logits)}

  def _seq_group_tensors(self, group_name, batch, pulled):
    ctx = self.ctx
    group = ctx.seq_att_groups[group_name]
    query, hist, mask, aux = seq_group_tensors(ctx, group, batch, pulled)
    return query, hist, mask, aux

  def _din_tower(self, tower, batch, pulled, training):
    query, hist, mask, aux = self._seq_group_tensors(
        tower.input, batch, pulled)
    group = self.ctx.seq_att_groups[tower.input]
    need_key = getattr(group, 'need_key_feature', True) and \
        query is not None
    if not need_key:
      # no target key: the masked mean of the history is the query
      # (reference seq_input_layer need_key_feature=false)
      denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
      query = (hist * mask[:, :, None]).sum(axis=1) / denom
    elif query.shape[-1] != hist.shape[-1]:
      if not getattr(group, 'allow_key_transform', False):
        raise ValueError(
            'seq_att group %r: key dim %d != hist dim %d; set '
            'allow_key_transform to project the key'
            % (tower.input, query.shape[-1], hist.shape[-1]))
      query = nn.Dense(hist.shape[-1],
                       name='key_transform_%s' % tower.input)(query)
    att = DinAttention(
        attention_dims=tuple(tower.dnn.hidden_units)[:-1] or (32,),
        activation=tower.dnn.activation or 'relu',
        name='din_%s' % tower.input)(query, hist, mask, training,
                                     aux=tuple(aux))
    seq_dnn = getattr(group, 'seq_dnn', None)
    if seq_dnn is not None and len(seq_dnn.hidden_units):
      att = DNN.from_config(seq_dnn, name='seq_dnn_%s' % tower.input)(
          att, training)
    if not need_key:
      return att
    return jnp.concatenate([att, query], axis=1)

  def _bst_tower(self, tower, batch, pulled, training):
    query, hist, mask, _ = self._seq_group_tensors(
        tower.input, batch, pulled)
    hidden = hist.shape[-1]
    # the legacy MultiTowerBST has NO dropout anywhere (reference
    # model/multi_tower_bst.py attention_net/add_and_norm — unlike the
    # backbone BST keras layer which defaults to 0.1/0.1)
    return BSTEncoder(
        hidden_size=hidden,
        num_heads=int(tower.multi_head_size) or 4,
        intermediate_size=hidden * 4,
        max_position=max(int(tower.seq_len), hist.shape[1] + 1),
        hidden_dropout=0.0,
        attention_dropout=0.0,
        pre_ln=bool(getattr(tower, 'pre_ln', False)),
        name='bst_%s' % tower.input)(hist, mask, target=query,
                                     training=training)


@register_model('MultiTower')
@register_model('MultiTowerDIN')
@register_model('MultiTowerBST')
class MultiTower(RankModel):
  """reference: model/multi_tower.py, multi_tower_din.py:18,
  multi_tower_bst.py"""

  def make_module(self):
    return _WithPrediction(self,
                           _MultiTowerModule(self.ctx, self.logits_dim()))


class _DCNModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.dcn
    deep_in = group_input(ctx, pulled, batch, cfg.deep_tower.input,
                          training)
    # the towers usually share one group: render (and attend) it once
    cross_in = deep_in if cfg.cross_tower.input == cfg.deep_tower.input \
        else group_input(ctx, pulled, batch, cfg.cross_tower.input,
                         training)
    deep = DNN.from_config(cfg.deep_tower.dnn, name='deep',
                           compute_dtype=ctx.compute_dtype)(deep_in,
                                                            training)
    cross = CrossNet(num_layers=int(cfg.cross_tower.cross_num) or 3,
                     name='cross')(cross_in)
    final_in = jnp.concatenate([deep, cross], axis=1)
    final = DNN.from_config(cfg.final_dnn, name='final_dnn',
                            compute_dtype=ctx.compute_dtype)(final_in,
                                                             training)
    return {'raw_logits': _final_logits(final, self.num_logits)}


@register_model('DCN')
class DCN(RankModel):
  """reference: model/dcn.py:15"""

  def make_module(self):
    return _WithPrediction(self, _DCNModule(self.ctx, self.logits_dim()))


class _AutoIntModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.autoint
    group = next((g for g in ctx.groups if g in ('all', 'deep')),
                 next(iter(g for g in ctx.groups if g != 'wide'),
                      next(iter(ctx.groups))))
    names = [f for f in ctx.group_features(group)
             if ctx.specs[f].kind == 'categorical']
    x = il.group_stack(pulled, batch, names)
    # group-level sequence_features join the interaction as one more
    # field (attended history vector projected to the field dim)
    from easyrec_tpu.models.seq_input import seq_att_output
    for sg in ctx.groups[group].sequence_features:
      att = seq_att_output(ctx, sg, batch, pulled, training)
      if att.shape[-1] != x.shape[-1]:
        att = nn.Dense(x.shape[-1],
                       name='seq_proj_%s' % (sg.group_name or 'seq'))(att)
      x = jnp.concatenate([x, att[:, None, :]], axis=1)
    heads = int(cfg.multi_head_num) or 1
    head_size = int(cfg.multi_head_size) or x.shape[-1]
    for i in range(int(cfg.interacting_layer_num) or 1):
      x = MultiHeadSelfAttention(num_heads=heads, head_size=head_size,
                                 name='interact_%d' % i)(x)
    flat = x.reshape(x.shape[0], -1)
    return {'raw_logits': _final_logits(flat, self.num_logits)}


@register_model('AutoInt')
class AutoInt(RankModel):
  """reference: model/autoint.py:16"""

  def make_module(self):
    return _WithPrediction(self, _AutoIntModule(self.ctx,
                                                self.logits_dim()))


class _DLRMModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.dlrm
    # groups: 'dense' (raw features) and 'sparse' (categorical)
    dense_names = ctx.group_features('dense') if 'dense' in ctx.groups \
        else []
    sparse_group = 'sparse' if 'sparse' in ctx.groups else \
        next(iter(ctx.groups))
    sparse_names = [f for f in ctx.group_features(sparse_group)
                    if ctx.specs[f].kind == 'categorical']
    cat_emb = il.group_stack(pulled, batch, sparse_names)   # [B, F, D]
    d = cat_emb.shape[-1]
    feats = [cat_emb]
    bot_out = None
    if dense_names:
      dense_in = il.group_concat(pulled, batch, dense_names)
      bot_out = DNN.from_config(cfg.bot_dnn, name='bot_dnn',
                                compute_dtype=ctx.compute_dtype)(
                                    dense_in, training)
      if bot_out.shape[-1] != d:
        bot_out = nn.Dense(d, name='bot_proj')(bot_out)
      feats = [bot_out[:, None, :], cat_emb]
    x = jnp.concatenate(feats, axis=1)
    if (cfg.arch_interaction_op or 'dot') == 'dot':
      inter = DotInteraction(
          self_interaction=cfg.arch_interaction_itself,
          name='dot_interaction')(x)
      # reference dlrm.py:60-63: top input = [interactions | sparse
      # embeddings] + the dense bottom output ONLY when
      # arch_with_dense_feature is set
      tops = [inter, cat_emb.reshape(cat_emb.shape[0], -1)]
      if cfg.arch_with_dense_feature and bot_out is not None:
        tops.append(bot_out)
    else:
      # 'cat': everything is already in x (reference dlrm.py:52)
      tops = [x.reshape(x.shape[0], -1)]
    top_in = jnp.concatenate(tops, axis=1)
    top = DNN.from_config(cfg.top_dnn, name='top_dnn',
                          compute_dtype=ctx.compute_dtype)(top_in, training)
    return {'raw_logits': _final_logits(top, self.num_logits)}


@register_model('DLRM')
class DLRM(RankModel):
  """reference: model/dlrm.py:16"""

  def make_module(self):
    return _WithPrediction(self, _DLRMModule(self.ctx, self.logits_dim()))


class _FMModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    deep_group = 'deep' if 'deep' in ctx.groups else \
        next(iter(g for g in ctx.groups if g != 'wide'))
    names = [f for f in ctx.group_features(deep_group)
             if ctx.specs[f].kind == 'categorical']
    x = il.group_stack(pulled, batch, names)
    fm_out = FMLayer(use_variant=False, name='fm')(x)   # [B, 1]
    logits = fm_out
    if 'wide' in ctx.groups:
      wide = il.wide_logits(pulled, batch, ctx.group_features('wide'))
      logits = logits + jnp.sum(wide, axis=1, keepdims=True)
    bias = self.param('global_bias', nn.initializers.zeros, (1,))
    return {'raw_logits': logits + bias[None, :]}


@register_model('FM')
class FM(RankModel):
  """reference: model/fm.py"""

  def __init__(self, ctx):
    super().__init__(ctx)
    self.wide_output_dim = 1

  def make_module(self):
    return _WithPrediction(self, _FMModule(self.ctx, self.logits_dim()))


class _DummyModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    b = batch['sample_weight'].shape[0]
    bias = self.param('bias', nn.initializers.zeros, (1,))
    return {'raw_logits': jnp.zeros((b, 1)) + bias[None, :]}


@register_model('DummyModel')
class DummyModel(RankModel):
  """input-pipeline perf testing (reference model/dummy_model.py)."""

  def make_module(self):
    return _WithPrediction(self, _DummyModule(self.ctx))


class _WithPrediction(nn.Module):
  """Wraps a raw-logit module and attaches probs/preds (+ learned or
  random multi-loss weights, rank_model.py:284-322)."""
  model: Any
  inner: nn.Module

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    from easyrec_tpu.protos import models_pb2 as _m
    out = self.inner(batch, pulled, training)
    pred = self.model._prediction(out.pop('raw_logits'))
    out.update(pred)
    cfg = self.model.config
    n_losses = max(len(cfg.losses), 1) + len(cfg.kd)
    Strategy = _m.EasyRecModel.LossWeightStrategy
    if n_losses > 1:
      if cfg.loss_weight_strategy == Strategy.Uncertainty:
        out['uncertainty_w'] = self.param(
            'loss_uncertainty', nn.initializers.zeros, (n_losses,))
      elif cfg.loss_weight_strategy == Strategy.Random:
        rng = self.make_rng('dropout') if training else \
            jax.random.PRNGKey(0)
        out['random_loss_w'] = jax.nn.softmax(
            jax.random.normal(rng, (n_losses,))) * n_losses
    return out
