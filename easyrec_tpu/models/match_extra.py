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


def _linear_final(cfg, name):
  """last_layer_no_activation=True, last_layer_no_batch_norm=True —
  every PDN sub-net head in the reference (pdn.py:85-94, 112-133,
  147-170, 190-196)."""
  return DNN.from_config(cfg, name=name, use_final_activation=False,
                         use_final_bn=False)


class _PDNModule(nn.Module):
  """PDN (reference model/pdn.py:42-200): per-position POSITIVE path
  scores — trigger_out = exp(trigger_dnn(u2i_dnn([u2i_seq; i_seq]) +
  user_fea)), sim_out = exp(sim_dnn([cross, cross, i2i_seq, item])) with
  cross = i2i_dnn(i_seq) * item_fea — masked-summed over the behavior
  sequence, plus softplus direct-similarity and softplus bias nets.
  probs = 1 - exp(-sum)  (additive hazards); logits = log(probs).

  Feature groups: 'user', 'item', optional 'bias'; sequence groups
  'u2i_seq' / 'i_seq' / 'i2i_seq' (reference layout). A single 'hist'
  group may stand in for all three (our compact sample layout).
  """
  ctx: Any
  model: Any

  def _seq(self, il, pulled, batch, group):
    seqs, mask = [], None
    for f in self.ctx.group_features(group):
      if self.ctx.specs[f].kind != 'sequence':
        continue
      s, m = il.sequence_embedding(pulled, batch, f)
      seqs.append(s)
      mask = m if mask is None else jnp.maximum(mask, m)
    return (jnp.concatenate(seqs, axis=-1) if len(seqs) > 1 else seqs[0],
            mask)

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.pdn

    user_in = il.group_concat(pulled, batch, ctx.group_features('user'))
    item_in = il.group_concat(pulled, batch, ctx.group_features('item'))

    if 'i_seq' in ctx.groups:
      i_seq, mask = self._seq(il, pulled, batch, 'i_seq')
      u2i_seq, _ = self._seq(il, pulled, batch, 'u2i_seq') \
          if 'u2i_seq' in ctx.groups else (i_seq, mask)
      i2i_seq, _ = self._seq(il, pulled, batch, 'i2i_seq') \
          if 'i2i_seq' in ctx.groups else (i_seq, mask)
    else:
      i_seq, mask = self._seq(il, pulled, batch, 'hist')
      u2i_seq = i2i_seq = i_seq

    # ---- trigger net (pdn.py:74-105)
    user_fea = DNN.from_config(cfg.user_dnn, name='user_dnn')(
        user_in, training)
    tseq = DNN.from_config(cfg.u2i_dnn, name='u2i_dnn')(
        jnp.concatenate([u2i_seq, i_seq], axis=-1), training)
    merged = tseq + user_fea[:, None, :]
    trigger_out = jnp.exp(_linear_final(cfg.trigger_dnn, 'trigger_dnn')(
        merged, training))                              # [B, L, 1]

    # ---- similarity net (pdn.py:107-142)
    item_fea = DNN.from_config(cfg.item_dnn, name='item_dnn')(
        item_in, training)
    sim_seq = DNN.from_config(cfg.i2i_dnn, name='i2i_dnn')(
        i_seq, training)
    cross = sim_seq * item_fea[:, None, :]
    l_steps = i_seq.shape[1]
    item_tile = jnp.repeat(item_fea[:, None, :], l_steps, axis=1)
    sim_in = jnp.concatenate([cross, cross, i2i_seq, item_tile], axis=-1)
    sim_out = jnp.exp(_linear_final(cfg.sim_dnn, 'sim_dnn')(
        sim_in, training)) if len(cfg.sim_dnn.hidden_units) else \
        jnp.ones_like(trigger_out)                      # [B, L, 1]

    score = jnp.sum((trigger_out * sim_out)[..., 0] * mask, axis=1)

    # ---- direct net (pdn.py:144-185): softplus(scaled similarity)
    du = di = None
    if len(cfg.direct_user_dnn.hidden_units) and \
        len(cfg.direct_item_dnn.hidden_units):
      du = _linear_final(cfg.direct_user_dnn, 'direct_user')(
          user_in, training)
      di = _linear_final(cfg.direct_item_dnn, 'direct_item')(
          item_in, training)
      if self.model.simi_func == Similarity.COSINE:
        du, di = _normalize(du), _normalize(di)
      direct = jnp.sum(du * di, axis=1)
      if cfg.scale_simi:
        w = self.param('direct_sim_w', nn.initializers.ones, (1,))
        b = self.param('direct_sim_b', nn.initializers.zeros, (1,))
        direct = direct * jnp.abs(w[0]) + b[0]
      score = score + nn.softplus(direct)

    # ---- bias net (pdn.py:187-199)
    if len(cfg.bias_dnn.hidden_units) and 'bias' in ctx.groups:
      bias_in = il.group_concat(pulled, batch, ctx.group_features('bias'))
      bias = _linear_final(cfg.bias_dnn, 'bias_dnn')(bias_in, training)
      score = score + nn.softplus(bias[:, 0])

    # additive-hazard link: probs in [0, 1); logits = log(probs) feeds
    # the reference's sigmoid-CE pointwise loss unchanged (pdn.py:61-64)
    probs = 1.0 - jnp.exp(-score)
    logits = jnp.log(jnp.clip(probs, 1e-8, 1 - 1e-8))
    out = {'logits': logits, 'probs': probs,
           'trigger_out': trigger_out[..., 0], 'sim_out': sim_out[..., 0]}
    if du is not None:
      out['user_tower_emb'], out['item_tower_emb'] = du, di
    return out


@register_model('PDN')
class PDN(MatchModel):
  """reference: model/pdn.py (path-based deep network for i2i recall)."""

  def make_module(self):
    return _PDNModule(self.ctx, self)

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    # reference routes PDN through the CLASSIFICATION pointwise loss on
    # its log-prob 'logits' (match_model.py:257-263)
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
      # reference collaborative_metric_learning.py:104-112: last hidden
      # applied as a plain linear dense
      x = DNN.from_config(cfg.dnn, name='dnn', use_final_activation=False,
                          use_final_bn=False)(x, training)
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
