"""Extra ranking families: RocketLaunching (co-trained light/booster nets
with distillation) and the multi-modal fusion transformers CMBF / Uniter.

Reference: easy_rec/python/model/{rocket_launching.py, cmbf.py, uniter.py}
and layers/multihead_cross_attention.py. The multi-modal towers consume
three conventional feature groups: 'image' (dense patch features), 'text'
(id/tag embeddings, one token per feature) and 'other'/'general'.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.attention import PackedMHA, TransformerBlock
from easyrec_tpu.layers.dnn import DNN
from easyrec_tpu.losses import losses as L
from easyrec_tpu.models.base import RankModel, register_model
from easyrec_tpu.protos import common_pb2

Similarity = common_pb2.Similarity


# ---------------------------------------------------------------------------
# RocketLaunching
# ---------------------------------------------------------------------------


class _RocketModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    cfg = ctx.model_config.rocket_launching
    group = 'all' if 'all' in ctx.groups else next(iter(ctx.groups))
    x = ctx.input_layer.group_concat(pulled, batch,
                                     ctx.group_features(group))
    shared = DNN.from_config(cfg.share_dnn, name='share_dnn')(x, training) \
        if len(cfg.share_dnn.hidden_units) else x
    booster_hidden = []
    h = shared
    for i, units in enumerate(cfg.booster_dnn.hidden_units):
      h = nn.Dense(units, name='booster_dense_%d' % i)(h)
      h = nn.relu(h)
      booster_hidden.append(h)
    booster_logits = nn.Dense(self.num_logits, name='booster_logits')(h)
    light_hidden = []
    # light net consumes the shared representation with stopped gradient
    # (the booster must not be dragged down by the light net)
    lh = jax.lax.stop_gradient(shared)
    for i, units in enumerate(cfg.light_dnn.hidden_units):
      lh = nn.Dense(units, name='light_dense_%d' % i)(lh)
      lh = nn.relu(lh)
      light_hidden.append(lh)
    light_logits = nn.Dense(self.num_logits, name='light_logits')(lh)
    return {'raw_logits': light_logits,
            'booster_logits': booster_logits,
            'light_hidden': light_hidden,
            'booster_hidden': booster_hidden}


@register_model('RocketLaunching')
class RocketLaunching(RankModel):
  """Light/booster co-training + distillation
  (reference model/rocket_launching.py)."""

  def make_module(self):
    from easyrec_tpu.models.rank import _WithPrediction
    return _WithPrediction(self, _RocketModule(self.ctx,
                                               self.logits_dim()))

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    light = outputs['logits']
    booster = outputs['booster_logits']
    if booster.ndim > 1 and booster.shape[-1] == 1:
      booster = booster[:, 0]
    l_light = L.sigmoid_cross_entropy(labels, light, weights)
    l_booster = L.sigmoid_cross_entropy(labels, booster, weights)
    # hint loss: light mimics the (stopped) booster logits
    hint = L.l2_loss(jax.lax.stop_gradient(jax.nn.sigmoid(booster)),
                     jax.nn.sigmoid(light), weights)
    losses = {'light_ce': l_light, 'booster_ce': l_booster,
              'hint_loss': hint}
    total = l_light + l_booster + hint
    cfg = self.config.rocket_launching
    if cfg.feature_based_distillation and outputs.get('light_hidden'):
      from easyrec_tpu.protos import common_pb2
      use_cosine = (cfg.feature_distillation_function ==
                    common_pb2.Similarity.Value('COSINE'))
      sims = []
      for lh, bh in zip(outputs['light_hidden'],
                        outputs['booster_hidden']):
        bh = jax.lax.stop_gradient(bh)
        if lh.shape == bh.shape:
          if use_cosine:
            ln = lh / jnp.maximum(
                jnp.linalg.norm(lh, axis=-1, keepdims=True), 1e-9)
            bn = bh / jnp.maximum(
                jnp.linalg.norm(bh, axis=-1, keepdims=True), 1e-9)
            sims.append(1.0 - jnp.mean(jnp.sum(ln * bn, axis=-1)))
          else:
            # euclidean hint (reference rocket_launching.py:55-58)
            sims.append(jnp.sqrt(
                jnp.mean(jnp.square(lh - bh)) + 1e-12))
      if sims:
        fd = sum(sims) / len(sims)
        losses['feature_distill'] = fd
        total = total + fd
    return total, losses

  def export_outputs(self, outputs):
    out = super().export_outputs(outputs)
    b = outputs['booster_logits']
    out['booster_probs'] = jax.nn.sigmoid(
        b[:, 0] if b.ndim > 1 and b.shape[-1] == 1 else b)
    return out


# ---------------------------------------------------------------------------
# CMBF / Uniter multi-modal towers
# ---------------------------------------------------------------------------


def _image_tokens(ctx, batch, patch_num: int, name_prefix: str):
  """'image' group dense features -> [B, patch_num, dim] tokens;
  None when the config has no image group (text-only variants —
  reference cmbf_on_movielens_only_text_feature.config)."""
  if 'image' not in ctx.groups:
    return None
  names = ctx.group_features('image')
  flat = jnp.concatenate(
      [ctx.input_layer.dense_feature(batch, f) for f in names
       if ctx.specs[f].kind == 'dense'], axis=-1)
  b, total = flat.shape
  assert total % patch_num == 0, \
      'image feature dim %d not divisible by patch num %d' % (total,
                                                              patch_num)
  return flat.reshape(b, patch_num, total // patch_num)


def _text_tokens(ctx, pulled, batch):
  """'text' group embeddings -> [B, F, D] one token per feature; None
  when the config has no text group (image-only variants)."""
  if 'text' not in ctx.groups:
    return None
  names = ctx.group_features('text')
  return ctx.input_layer.group_stack(pulled, batch, names)


def _other_features(ctx, pulled, batch):
  for g in ('other', 'general'):
    if g in ctx.groups:
      return ctx.input_layer.group_concat(pulled, batch,
                                          ctx.group_features(g))
  return None


class CMBFEncoder(nn.Module):
  """Cross-Modal-Based Fusion encoder: per-modality self attention +
  bidirectional cross-modal attention -> fused vector (reference
  model/cmbf.py, layers/cmbf.py). Reused as DBMTL's bottom_cmbf."""
  ctx: Any
  cfg: Any        # CMBFTower proto

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    cfg = self.cfg

    img = _image_tokens(ctx, batch, int(cfg.image_feature_patch_num) or 1,
                        'cmbf')
    txt = _text_tokens(ctx, pulled, batch)
    assert img is not None or txt is not None, \
        'CMBF needs an "image" and/or "text" feature group'
    d_img = int(cfg.image_head_size) * int(cfg.image_multi_head_num)
    d_txt = (int(cfg.text_head_size) or 16) * int(cfg.text_multi_head_num)
    ones = jnp.ones
    if img is not None:
      img = nn.Dense(d_img, name='img_proj')(img)
      img_mask = ones(img.shape[:2], img.dtype)
      for i in range(int(cfg.image_self_attention_layer_num)):
        img = TransformerBlock(
            hidden_size=d_img, num_heads=int(cfg.image_multi_head_num),
            intermediate_size=d_img * 2,
            hidden_dropout=cfg.hidden_dropout_prob,
            attention_dropout=cfg.attention_probs_dropout_prob,
            name='img_sa_%d' % i)(img, img_mask, training)
    if txt is not None:
      txt = nn.Dense(d_txt, name='txt_proj')(txt)
      txt_mask = ones(txt.shape[:2], txt.dtype)
      for i in range(int(cfg.text_self_attention_layer_num)):
        txt = TransformerBlock(
            hidden_size=d_txt, num_heads=int(cfg.text_multi_head_num),
            intermediate_size=d_txt * 2,
            hidden_dropout=cfg.hidden_dropout_prob,
            attention_dropout=cfg.attention_probs_dropout_prob,
            name='txt_sa_%d' % i)(txt, txt_mask, training)

    if img is None or txt is None:
      # single-modality variant (reference cmbf_on_movielens_only_
      # {image,text}_feature.config): per-modality self attention only
      parts = [(img if txt is None else txt).mean(axis=1)]
    else:
      # cross-modal: text attends to image tokens and vice versa
      d_cross = max(d_img, d_txt)
      img_c = nn.Dense(d_cross, name='img_cross_proj')(img)
      txt_c = nn.Dense(d_cross, name='txt_cross_proj')(txt)
      for i in range(int(cfg.cross_modal_layer_num) or 1):
        # PackedMHA: head-packed attention (param-compatible with the
        # stock flax MHA; see layers/attention.py)
        t2i = PackedMHA(
            num_heads=int(cfg.multi_head_num) or 1, qkv_features=d_cross,
            out_features=d_cross, deterministic=not training,
            name='t2i_%d' % i)(txt_c, img_c)
        i2t = PackedMHA(
            num_heads=int(cfg.multi_head_num) or 1, qkv_features=d_cross,
            out_features=d_cross, deterministic=not training,
            name='i2t_%d' % i)(img_c, txt_c)
        txt_c = nn.LayerNorm(name='t_ln_%d' % i)(txt_c + t2i)
        img_c = nn.LayerNorm(name='i_ln_%d' % i)(img_c + i2t)
      parts = [txt_c.mean(axis=1), img_c.mean(axis=1)]
    other = _other_features(ctx, pulled, batch)
    if other is not None:
      if cfg.HasField('other_feature_dnn') and \
              len(cfg.other_feature_dnn.hidden_units):
        other = DNN.from_config(cfg.other_feature_dnn,
                                name='other_dnn')(other, training)
      parts.append(other)
    return jnp.concatenate(parts, axis=-1)


class _CMBFModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    cmbf = self.ctx.model_config.cmbf
    h = CMBFEncoder(self.ctx, cmbf.config, name='encoder')(
        batch, pulled, training)
    if len(cmbf.final_dnn.hidden_units):
      h = DNN.from_config(cmbf.final_dnn, name='final_dnn')(h, training)
    return {'raw_logits': nn.Dense(self.num_logits, name='logits')(h)}


@register_model('CMBF')
class CMBF(RankModel):
  """reference: model/cmbf.py (image+text cross-modal fusion)."""

  def make_module(self):
    from easyrec_tpu.models.rank import _WithPrediction
    return _WithPrediction(self, _CMBFModule(self.ctx, self.logits_dim()))


class UniterEncoder(nn.Module):
  """UNITER-style single-stream fusion encoder: one transformer over
  concatenated [image tokens; text tokens] -> fused vector (reference
  model/uniter.py). Reused as DBMTL's bottom_uniter."""
  ctx: Any
  cfg: Any       # UniterTower proto

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    cfg = self.cfg
    d = int(cfg.hidden_size) or 64

    img = _image_tokens(ctx, batch, 1, 'uniter')
    txt = _text_tokens(ctx, pulled, batch)
    assert img is not None or txt is not None, \
        'Uniter needs an "image" and/or "text" feature group'
    toks = []
    if img is not None:
      toks.append(nn.Dense(d, name='img_proj')(img))
    if txt is not None:
      toks.append(nn.Dense(d, name='txt_proj')(txt))
    tokens = jnp.concatenate(toks, axis=1) if len(toks) > 1 else toks[0]
    mask = jnp.ones(tokens.shape[:2], tokens.dtype)
    if cfg.use_position_embeddings:
      pos = self.param('position_emb', nn.initializers.normal(
          cfg.initializer_range or 0.02),
          (int(cfg.max_position_embeddings) or 512, d))
      tokens = tokens + pos[None, :tokens.shape[1], :]
    for i in range(int(cfg.num_hidden_layers) or 1):
      tokens = TransformerBlock(
          hidden_size=d, num_heads=int(cfg.num_attention_heads) or 4,
          intermediate_size=int(cfg.intermediate_size) or d * 4,
          hidden_act=cfg.hidden_act or 'gelu',
          hidden_dropout=cfg.hidden_dropout_prob,
          attention_dropout=cfg.attention_probs_dropout_prob,
          name='block_%d' % i)(tokens, mask, training)
    parts = [tokens.mean(axis=1)]
    other = _other_features(ctx, pulled, batch)
    if other is not None:
      if cfg.HasField('other_feature_dnn') and \
              len(cfg.other_feature_dnn.hidden_units):
        other = DNN.from_config(cfg.other_feature_dnn,
                                name='other_dnn')(other, training)
      parts.append(other)
    return jnp.concatenate(parts, axis=-1)


class _UniterModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    uniter = self.ctx.model_config.uniter
    h = UniterEncoder(self.ctx, uniter.config, name='encoder')(
        batch, pulled, training)
    if len(uniter.final_dnn.hidden_units):
      h = DNN.from_config(uniter.final_dnn, name='final_dnn')(h, training)
    return {'raw_logits': nn.Dense(self.num_logits, name='logits')(h)}


@register_model('Uniter')
class Uniter(RankModel):
  """reference: model/uniter.py (single-stream multi-modal fusion)."""

  def make_module(self):
    from easyrec_tpu.models.rank import _WithPrediction
    return _WithPrediction(self, _UniterModule(self.ctx,
                                               self.logits_dim()))
