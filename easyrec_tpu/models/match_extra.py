"""Extra matching families: PDN (path-based deep network) and
CoMetricLearningI2I (collaborative metric learning).

Reference: easy_rec/python/model/{pdn.py, collaborative_metric_learning.py}.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import DNN, Highway
from easyrec_tpu.losses import losses as L
from easyrec_tpu.models.base import BaseModel, register_model
from easyrec_tpu.models.match import MatchModel, _normalize
from easyrec_tpu.protos import common_pb2

Similarity = common_pb2.Similarity


class _PDNModule(nn.Module):
  """PDN: score = direct(user, item) + sum_t u2i(user, trigger_t) *
  i2i(trigger_t, item) over the user's behavior sequence (triggers).

  Feature groups: 'user', 'item', and a sequence group 'hist' whose
  per-step embeddings are the trigger items (reference model/pdn.py).
  """
  ctx: Any
  model: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.pdn

    user_in = il.group_concat(pulled, batch, ctx.group_features('user'))
    item_in = il.group_concat(pulled, batch, ctx.group_features('item'))
    user_emb = DNN.from_config(cfg.user_dnn, name='user_dnn')(
        user_in, training)
    item_emb = DNN.from_config(cfg.item_dnn, name='item_dnn')(
        item_in, training)

    # triggers: the user's behavior sequence
    hist_names = [f for f in ctx.group_features('hist')
                  if ctx.specs[f].kind == 'sequence']
    seqs, mask = [], None
    for h in hist_names:
      s, m = il.sequence_embedding(pulled, batch, h)
      seqs.append(s)
      mask = m if mask is None else jnp.maximum(mask, m)
    hist = jnp.concatenate(seqs, axis=-1) if len(seqs) > 1 else seqs[0]
    trigger = DNN.from_config(cfg.trigger_dnn, name='trigger_dnn')(
        hist, training)                               # [B, L, Dt]

    # trigger path: u2i weight per step x i2i relevance per step
    L_steps = trigger.shape[1]
    u_tiled = jnp.repeat(user_emb[:, None, :], L_steps, axis=1)
    u2i_in = jnp.concatenate([u_tiled, trigger], axis=-1)
    u2i = DNN.from_config(cfg.u2i_dnn, name='u2i_dnn')(u2i_in, training)
    u2i_w = nn.softplus(nn.Dense(1, name='u2i_w')(u2i))[..., 0]  # [B, L]

    i_tiled = jnp.repeat(item_emb[:, None, :], L_steps, axis=1)
    i2i_in = jnp.concatenate(
        [trigger, i_tiled, trigger * i_tiled], axis=-1)
    i2i = DNN.from_config(cfg.i2i_dnn, name='i2i_dnn')(i2i_in, training)
    i2i_s = nn.Dense(1, name='i2i_s')(i2i)[..., 0]               # [B, L]

    trigger_score = jnp.sum(u2i_w * i2i_s * mask, axis=1)

    # direct path
    du = DNN.from_config(cfg.direct_user_dnn, name='direct_user')(
        user_in, training) if len(cfg.direct_user_dnn.hidden_units) \
        else user_emb
    di = DNN.from_config(cfg.direct_item_dnn, name='direct_item')(
        item_in, training) if len(cfg.direct_item_dnn.hidden_units) \
        else item_emb
    if self.model.simi_func == Similarity.COSINE:
      direct = jnp.sum(_normalize(du) * _normalize(di), axis=1)
    else:
      direct = jnp.sum(du * di, axis=1)

    logits = direct + trigger_score
    if len(cfg.bias_dnn.hidden_units):
      bias_in = jnp.concatenate([user_in, item_in], axis=-1)
      bias = DNN.from_config(cfg.bias_dnn, name='bias_dnn')(
          bias_in, training)
      logits = logits + nn.Dense(1, name='bias_out')(bias)[:, 0]
    return {'user_tower_emb': du, 'item_tower_emb': di,
            'logits': logits, 'probs': jax.nn.sigmoid(logits)}


@register_model('PDN')
class PDN(MatchModel):
  """reference: model/pdn.py (path-based deep network for i2i recall)."""

  def make_module(self):
    return _PDNModule(self.ctx, self)

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    loss = L.sigmoid_cross_entropy(labels, outputs['logits'], weights)
    return loss, {'sigmoid_cross_entropy': loss}

  def metric_inputs(self, outputs, batch):
    return {'labels': self.labels(batch), 'probs': outputs['probs'],
            'preds': outputs['probs'],
            'weights': self.sample_weights(batch)}


class _CMLModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    cfg = ctx.model_config.metric_learning
    group = cfg.input or next(iter(ctx.groups))
    x = ctx.input_layer.group_concat(pulled, batch,
                                     ctx.group_features(group))
    for i, hw in enumerate(cfg.highway):
      x = Highway(emb_size=int(hw.emb_size),
                  activation=hw.activation or 'relu',
                  num_layers=int(hw.num_layers) or 1,
                  name='highway_%d' % i)(x, training)
    if len(cfg.dnn.hidden_units):
      x = DNN.from_config(cfg.dnn, name='dnn')(x, training)
    if cfg.output_l2_normalized_emb:
      x = _normalize(x)
    return {'float_emb': x}


@register_model('CoMetricLearningI2I')
class CoMetricLearningI2I(BaseModel):
  """Collaborative metric learning: items sharing a session are pulled
  together with circle / multi-similarity loss
  (reference model/collaborative_metric_learning.py)."""

  def make_module(self):
    return _CMLModule(self.ctx)

  def _session_ids(self, batch):
    cfg = self.config.metric_learning
    for key in ('field.%s' % cfg.session_id, 'label.%s' % cfg.session_id):
      if key in batch:
        return batch[key]
    raise KeyError('CoMetricLearningI2I needs session_id column %r in the '
                   'batch (add it to eval/loss extra fields)' %
                   cfg.session_id)

  def build_loss(self, outputs, batch):
    cfg = self.config.metric_learning
    emb = outputs['float_emb']
    sess = self._session_ids(batch)
    weights = self.sample_weights(batch)
    which = cfg.WhichOneof('loss')
    if which == 'multi_similarity_loss':
      p = cfg.multi_similarity_loss
      loss = L.multi_similarity_loss(emb, sess, weights, alpha=p.alpha,
                                     beta=p.beta, lamb=p.lamb, eps=p.eps)
      return loss, {'multi_similarity_loss': loss}
    p = cfg.circle_loss
    loss = L.circle_loss(emb, sess, weights,
                         margin=p.margin if which else 0.25,
                         gamma=p.gamma if which else 32.0)
    return loss, {'circle_loss': loss}

  def metric_inputs(self, outputs, batch):
    emb = outputs['float_emb']
    sess = self._session_ids(batch)
    sim = emb @ emb.T
    same = (sess[None, :] == sess[:, None]).astype(jnp.float32)
    b = sim.shape[0]
    off = 1.0 - jnp.eye(b)
    # treat same-session off-diagonal pairs as positives scored by simi
    labels = same * off
    probs = jax.nn.sigmoid(sim)
    w = off
    return {'labels': labels.reshape(-1), 'probs': probs.reshape(-1),
            'preds': sim.reshape(-1), 'weights': w.reshape(-1)}

  def export_outputs(self, outputs):
    return {'float_emb': outputs['float_emb']}
