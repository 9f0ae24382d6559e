"""Matching / retrieval model zoo: DSSM, DSSM_SENet, DAT, MIND,
MultiTowerRecall, DropoutNet.

Reference: easy_rec/python/model/{dssm,dssm_senet,dat,mind,
multi_tower_recall,dropoutnet}.py and match_model.py:18-357. List-wise mode
uses in-batch softmax over the items of the batch with id-collision masking;
point-wise mode reduces to a sigmoid over the pair similarity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.capsule import CapsuleLayer
from easyrec_tpu.layers.dnn import DNN
from easyrec_tpu.layers.fibinet import SENet
from easyrec_tpu.losses import losses as L
from easyrec_tpu.models.base import (BaseModel, ModelContext, register_model)
from easyrec_tpu.protos import common_pb2, models_pb2

Similarity = common_pb2.Similarity
LossType = models_pb2.LossType


def _normalize(x):
  return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


class MatchModel(BaseModel):
  """Two-tower base: similarity, in-batch softmax loss, recall@k metrics
  (reference match_model.py)."""

  def _simi_cfg(self):
    which = self.config.WhichOneof('model')
    return getattr(self.config, which)

  @property
  def simi_func(self):
    cfg = self._simi_cfg()
    return cfg.simi_func if hasattr(cfg, 'simi_func') else Similarity.COSINE

  @property
  def temperature(self) -> float:
    cfg = self._simi_cfg()
    t = getattr(cfg, 'temperature', 1.0) or 1.0
    return float(t)

  @property
  def is_listwise(self) -> bool:
    # softmax CE -> in-batch listwise; CLASSIFICATION -> pointwise
    return self.config.loss_type == LossType.SOFTMAX_CROSS_ENTROPY

  def _tower_embs(self, outputs):
    return outputs['user_tower_emb'], outputs['item_tower_emb']

  def _item_id_mask(self, batch):
    """Mask colliding item ids in-batch (match_model.py:50-69)."""
    cfg = self._simi_cfg()
    item_id = getattr(cfg, 'item_id', '')
    ignore = getattr(cfg, 'ignore_in_batch_neg_sam', False)
    if not item_id or ignore:
      return None
    key = 'feat.%s.ids' % item_id
    if key not in batch:
      return None
    ids = batch[key][:, 0]
    same = ids[None, :] == ids[:, None]
    return same

  def _maybe_norm(self, x):
    return _normalize(x) if self.simi_func == Similarity.COSINE else x

  def _full_logits(self, outputs, batch):
    """[B, B + N + H] similarity columns: in-batch items, sampled
    negatives, per-row hard negatives (reference match_model.py:71-121
    _list_wise_sim with hard-negative scatter)."""
    user_emb, item_emb = self._tower_embs(outputs)
    u = self._maybe_norm(user_emb)
    neg = outputs.get('neg_item_tower_emb')
    neg_user = outputs.get('neg_user_tower_emb')
    if neg_user is not None and neg is not None:
      # negative-sampler target attention (reference
      # samples/model_config dssm + seq_att, sequence_feature_layer.py
      # negative_sampler re-query): each sampled item re-queries the
      # user history, so every candidate has its OWN user tower output.
      # Candidates are [positive | sampled negatives] -> [B, 1 + N];
      # in-batch items are not scored (B x B per-pair user towers would
      # be quadratic in towers, and the reference also drops them here).
      pos = jnp.sum(u * self._maybe_norm(item_emb), axis=1)   # [B]
      nu = self._maybe_norm(neg_user)                         # [B, N, D]
      nl = jnp.einsum('bnd,nd->bn', nu, self._maybe_norm(neg))
      cols = [pos[:, None], nl]
      hard = outputs.get('hard_neg_item_tower_emb')
      if hard is not None and 'hard_neg_mask' in batch:
        mask = batch['hard_neg_mask']                         # [B, H]
        h = mask.shape[1]
        hard = self._maybe_norm(hard).reshape(u.shape[0], h, -1)
        hl = jnp.einsum('bd,bhd->bh', u, hard)
        cols.append(jnp.where(mask > 0, hl, -1e9))
      return jnp.concatenate(cols, axis=1) / self.temperature
    cols = []
    logits = u @ self._maybe_norm(item_emb).T          # [B, B]
    b = logits.shape[0]
    collide = self._item_id_mask(batch)
    if collide is not None:
      off_diag = collide & ~jnp.eye(b, dtype=bool)
      logits = jnp.where(off_diag, -1e9, logits)
    cols.append(logits)
    if neg is not None:
      cols.append(u @ self._maybe_norm(neg).T)         # [B, N]
    hard = outputs.get('hard_neg_item_tower_emb')
    if hard is not None and 'hard_neg_mask' in batch:
      mask = batch['hard_neg_mask']                    # [B, H]
      h = mask.shape[1]
      hard = self._maybe_norm(hard).reshape(b, h, -1)
      hl = jnp.einsum('bd,bhd->bh', u, hard)
      cols.append(jnp.where(mask > 0, hl, -1e9))
    full = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    return full / self.temperature

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    if self.is_listwise:
      logits = self._full_logits(outputs, batch)
      logp = jax.nn.log_softmax(logits, axis=1)
      if outputs.get('neg_user_tower_emb') is not None:
        per = -logp[:, 0]        # positive is column 0 ([pos | negs])
      else:
        per = -jnp.diagonal(logp[:, :logits.shape[0]])
      w = weights * labels
      loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-9)
      return loss, {'softmax_cross_entropy': loss}
    logits = outputs['logits']
    if self.config.loss_type == LossType.L2_LOSS:
      # point-wise regression on the (scaled) similarity
      # (reference dssm.py:123, match_model.py:261 'y' + l2_loss)
      loss = L.l2_loss(labels, logits, weights)
      return loss, {'l2_loss': loss}
    loss = L.sigmoid_cross_entropy(labels, logits, weights)
    return loss, {'sigmoid_cross_entropy': loss}

  def metric_inputs(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    if self.is_listwise:
      logits = self._full_logits(outputs, batch)
      if outputs.get('neg_user_tower_emb') is not None:
        pos = logits[:, 0]
        return {'labels': labels, 'probs': jax.nn.sigmoid(pos),
                'preds': pos, 'weights': weights,
                'neg_sam_logits': logits}   # already [pos | negs]
      b = logits.shape[0]
      pos = jnp.diagonal(logits[:, :b])
      mi = {'labels': labels, 'probs': jax.nn.sigmoid(pos), 'preds': pos,
            'weights': weights, 'in_batch_logits': logits[:, :b]}
      if logits.shape[1] > b:
        # positive vs sampled negatives only (recall_neg_sam@k,
        # match_model.py:287-317)
        mi['neg_sam_logits'] = jnp.concatenate(
            [pos[:, None], logits[:, b:]], axis=1)
      return mi
    if self.config.loss_type == LossType.L2_LOSS:
      return {'labels': labels, 'probs': outputs['logits'],
              'preds': outputs['logits'], 'weights': weights}
    return {'labels': labels, 'probs': outputs['probs'],
            'preds': outputs['probs'], 'weights': weights}

  def export_outputs(self, outputs):
    out = {'user_emb': outputs['user_tower_emb'],
            'item_emb': outputs['item_tower_emb']}
    if self.config.loss_type == LossType.L2_LOSS:
      if 'logits' in outputs:
        out['y'] = outputs['logits']    # reference dssm.py get_outputs 'y'
    elif 'probs' in outputs:
      out['probs'] = outputs['probs']
    return out


def _tower_dnn(cfg, name, **kw):
  """Tower embedding head: the reference pops the last hidden unit off
  the DNN and applies it as a PLAIN linear dense (no activation, no bn)
  — dssm.py:42-62, dat.py:55-76, dropoutnet.py:80-135, mind.py:139-154.
  Equivalent here: same stack with a linear, bn-free final layer."""
  return DNN.from_config(cfg, name=name, use_final_activation=False,
                         use_final_bn=False, **kw)


class _TwoTowerModule(nn.Module):
  ctx: Any
  model: Any
  user_dnn_cfg: Any
  item_dnn_cfg: Any
  use_senet: bool = False
  senet_cfgs: Any = None

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    if self.use_senet:
      u_feats = il.group_stack(pulled, batch, ctx.group_features('user'))
      i_feats = il.group_stack(pulled, batch, ctx.group_features('item'))
      u_cfg, i_cfg = self.senet_cfgs
      user_in = SENet(reduction_ratio=int(u_cfg.reduction_ratio) or 4,
                      num_squeeze_group=int(u_cfg.num_squeeze_group) or 2,
                      name='user_senet')(u_feats)
      item_in = SENet(reduction_ratio=int(i_cfg.reduction_ratio) or 4,
                      num_squeeze_group=int(i_cfg.num_squeeze_group) or 2,
                      name='item_senet')(i_feats)
    else:
      user_in = il.group_concat(pulled, batch, ctx.group_features('user'))
      item_in = il.group_concat(pulled, batch, ctx.group_features('item'))
    user_dnn = _tower_dnn(self.user_dnn_cfg, 'user_dnn',
                          compute_dtype=ctx.compute_dtype)
    item_dnn = _tower_dnn(self.item_dnn_cfg, 'item_dnn',
                          compute_dtype=ctx.compute_dtype)

    # DIN target attention on the user tower when seq_att_groups are
    # declared: the attention query is the (candidate) item
    # (reference seq_att groups + negative_sampler_target_attention,
    # layers/sequence_feature_layer.py:42-190)
    att_maps = []
    for g in ctx.seq_att_groups.values():
      att_maps.extend(g.seq_att_map)
    atts = []
    if att_maps:
      from easyrec_tpu.layers.attention import DinAttention
      for i, m in enumerate(att_maps):
        keys_emb, mask = il.sequence_embedding(pulled, batch,
                                               m.hist_seq[0])
        att = DinAttention(name='seq_att_%d' % i)
        atts.append((att, keys_emb, mask, m.key[0]))
      pos_att = [att(query=il.feature_embedding(pulled, batch, kname),
                     keys=keys_emb, mask=mask, training=training)
                 for att, keys_emb, mask, kname in atts]
      user_base = user_in
      user_in = jnp.concatenate([user_in] + pos_att, axis=-1)

    user_emb = user_dnn(user_in, training)
    item_emb = item_dnn(item_in, training)
    out = {'user_tower_emb': user_emb, 'item_tower_emb': item_emb}
    # sampled negatives run through the SAME item tower (shared params,
    # reference match_model list-wise mode with sampler outputs)
    item_names = ctx.group_features('item')
    for pfx, key in (('neg.', 'neg_item_tower_emb'),
                     ('hard_neg.', 'hard_neg_item_tower_emb')):
      if any(k.startswith(pfx + 'feat.') for k in batch):
        neg_in = il.group_concat(pulled, batch, item_names, prefix=pfx)
        out[key] = item_dnn(neg_in, training)
        if atts and pfx == 'neg.':
          # negative-sampler target attention: per-NEGATIVE user towers
          # (each sampled item re-queries the user's history)
          n = neg_in.shape[0]
          b = user_in.shape[0]
          neg_att = []
          for att, keys_emb, mask, kname in atts:
            q = il.feature_embedding(pulled, batch, kname,
                                     prefix='neg.')          # [N, D]
            qb = jnp.broadcast_to(q[None], (b,) + q.shape)   # [B, N, D]
            keys_n = jnp.broadcast_to(
                keys_emb[:, None], (b, n) + keys_emb.shape[1:])
            mask_n = jnp.broadcast_to(mask[:, None],
                                      (b, n) + mask.shape[1:])
            neg_att.append(att(query=qb, keys=keys_n, mask=mask_n,
                               training=training))           # [B, N, D]
          base = jnp.broadcast_to(user_base[:, None],
                                  (b, n, user_base.shape[-1]))
          user_in_neg = jnp.concatenate([base] + neg_att, axis=-1)
          out['neg_user_tower_emb'] = user_dnn(user_in_neg, training)
    model = self.model
    if not model.is_listwise:
      if model.simi_func == Similarity.COSINE:
        sim = jnp.sum(_normalize(user_emb) * _normalize(item_emb), axis=1)
      else:
        sim = jnp.sum(user_emb * item_emb, axis=1)
      logits = sim / model.temperature
      cfg = model._simi_cfg()
      if getattr(cfg, 'scale_simi', False):
        scale = self.param('simi_scale', nn.initializers.ones, (1,))
        bias = self.param('simi_bias', nn.initializers.zeros, (1,))
        logits = logits * scale[0] + bias[0]
      out['logits'] = logits
      out['probs'] = jax.nn.sigmoid(logits)
    return out


@register_model('DSSM')
class DSSM(MatchModel):
  """reference: model/dssm.py:17"""

  def make_module(self):
    cfg = self.config.dssm
    return _TwoTowerModule(self.ctx, self, cfg.user_tower.dnn,
                           cfg.item_tower.dnn)


@register_model('DSSM_SENet')
class DSSMSENet(MatchModel):
  """reference: model/dssm_senet.py"""

  def make_module(self):
    cfg = self.config.dssm_senet
    return _TwoTowerModule(self.ctx, self, cfg.user_tower.dnn,
                           cfg.item_tower.dnn, use_senet=True,
                           senet_cfgs=(cfg.user_tower.senet,
                                       cfg.item_tower.senet))


class _DATModule(nn.Module):
  """Dual-augmented two-tower (reference dat.py:30-110): each tower's
  INPUT includes an augmented vector (tf.concat at dat.py:59-75) that
  the AMM loss supervises to mimic the OTHER tower's output."""
  ctx: Any
  model: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.dat
    user_in = il.group_concat(pulled, batch, ctx.group_features('user'))
    item_in = il.group_concat(pulled, batch, ctx.group_features('item'))
    u_last = cfg.user_tower.dnn.hidden_units[-1]
    i_last = cfg.item_tower.dnn.hidden_units[-1]
    # augmented vectors from the reference's dedicated groups
    # (dat.py:34-37 asserts user_id_augment/item_id_augment); learned
    # projections when the config omits them (extension)
    if 'user_id_augment' in ctx.groups and \
        'item_id_augment' in ctx.groups:
      au = il.group_concat(pulled, batch,
                           ctx.group_features('user_id_augment'))
      ai = il.group_concat(pulled, batch,
                           ctx.group_features('item_id_augment'))
    else:
      au = nn.Dense(i_last, name='user_aug_proj')(user_in)
      ai = nn.Dense(u_last, name='item_aug_proj')(item_in)
    user_emb = _tower_dnn(cfg.user_tower.dnn, 'user_dnn')(
        jnp.concatenate([user_in, au], axis=-1), training)
    item_emb = _tower_dnn(cfg.item_tower.dnn, 'item_dnn')(
        jnp.concatenate([item_in, ai], axis=-1), training)
    # AMM compares augmented_u against item_tower_emb (and vice versa):
    # fit dims when the augmented embedding width differs
    if au.shape[-1] != i_last:
      au = nn.Dense(i_last, name='user_aug_fit')(au)
    if ai.shape[-1] != u_last:
      ai = nn.Dense(u_last, name='item_aug_fit')(ai)
    return {'user_tower_emb': user_emb, 'item_tower_emb': item_emb,
            'augmented_u': au, 'augmented_i': ai}


@register_model('DAT')
class DAT(MatchModel):
  """reference: model/dat.py (dual augmented two-tower)"""

  def make_module(self):
    return _DATModule(self.ctx, self)

  def build_loss(self, outputs, batch):
    total, losses = super().build_loss(outputs, batch)
    cfg = self.config.dat
    labels = self.labels(batch)
    w = self.sample_weights(batch) * labels
    # adaptive mimic: augmented vec -> other tower's (stopped) embedding
    amm_u = jnp.sum(jnp.square(
        outputs['augmented_u'] -
        jax.lax.stop_gradient(outputs['item_tower_emb'])), axis=1)
    amm_i = jnp.sum(jnp.square(
        outputs['augmented_i'] -
        jax.lax.stop_gradient(outputs['user_tower_emb'])), axis=1)
    denom = jnp.maximum(jnp.sum(w), 1e-9)
    lu = jnp.sum(amm_u * w) / denom
    li = jnp.sum(amm_i * w) / denom
    losses['amm_loss_u'] = lu
    losses['amm_loss_i'] = li
    total = total + cfg.amm_u_weight * lu + cfg.amm_i_weight * li
    return total, losses


class _MINDModule(nn.Module):
  ctx: Any
  model: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.mind
    # history sequences from the 'hist' group (sequence features)
    hist_names = [f for f in ctx.group_features('hist')
                  if ctx.specs[f].kind == 'sequence' and
                  f != cfg.time_id_fea]
    seqs, mask = [], None
    for h in hist_names:
      s, m = il.sequence_embedding(pulled, batch, h)
      seqs.append(s)
      mask = m if mask is None else jnp.maximum(mask, m)
    if cfg.user_seq_combine == models_pb2.MIND.UserSeqCombineMethod.SUM:
      # reference mind.py:80-86: tf.add_n(...) / len — an AVERAGE
      # despite the enum name; keep its math for parity
      hist = sum(seqs) / len(seqs)
    else:
      hist = jnp.concatenate(seqs, axis=-1)
    if cfg.HasField('pre_capsule_dnn') and \
        len(cfg.pre_capsule_dnn.hidden_units):
      hist = DNN.from_config(cfg.pre_capsule_dnn, name='pre_capsule')(
          hist, training)
    if cfg.time_id_fea:
      # time-id softmax weighting of the history (mind.py:95-101): the
      # dim-1 time embedding is masked to -inf on padding and its
      # per-position softmax reweights the sequence
      t, tmask = il.sequence_embedding(pulled, batch, cfg.time_id_fea)
      neg = (tmask.astype(hist.dtype) * 2 - 1) * 1e32
      t = jnp.minimum(t, neg[:, :, None])
      hist = hist * jax.nn.softmax(t, axis=1)
    caps = cfg.capsule_config
    interests, caps_mask = CapsuleLayer(
        max_k=int(caps.max_k) or 5,
        high_dim=int(caps.high_dim) or hist.shape[-1],
        num_iters=int(caps.num_iters) or 3,
        routing_logits_scale=caps.routing_logits_scale,
        routing_logits_stddev=caps.routing_logits_stddev,
        squash_pow=caps.squash_pow,
        const_caps_num=caps.const_caps_num,
        name='capsule')(hist, mask, training)      # [B, K, H]

    user_in = il.group_concat(pulled, batch, ctx.group_features('user'))
    user_feat = DNN.from_config(cfg.user_dnn, name='user_dnn')(
        user_in, training)
    k = interests.shape[1]
    tiled = jnp.repeat(user_feat[:, None, :], k, axis=1)
    concat = jnp.concatenate([interests, tiled], axis=-1)
    user_interests = _tower_dnn(cfg.concat_dnn, 'concat_dnn')(
        concat, training)                           # [B, K, D]

    item_in = il.group_concat(pulled, batch, ctx.group_features('item'))
    item_emb = _tower_dnn(cfg.item_dnn, 'item_dnn')(
        item_in, training)

    # label-guided attention (mind.py:168-200): softmax(simi^pow) over
    # interests against the positive item
    iu = _normalize(user_interests) if \
        self.model.simi_func == Similarity.COSINE else user_interests
    ie = _normalize(item_emb) if \
        self.model.simi_func == Similarity.COSINE else item_emb
    simi = jnp.einsum('bkd,bd->bk', iu, ie)
    simi = jnp.where(caps_mask > 0, simi, -1e9)
    if cfg.simi_pow >= 100:
      att = jax.nn.one_hot(jnp.argmax(simi, axis=1), k)
    else:
      att = jax.nn.softmax(simi * cfg.simi_pow, axis=1)
    user_emb = jnp.einsum('bk,bkd->bd', att, user_interests)
    return {'user_tower_emb': user_emb, 'item_tower_emb': item_emb,
            'user_interests': user_interests, 'interests_mask': caps_mask}


@register_model('MIND')
class MIND(MatchModel):
  """reference: model/mind.py:21 (multi-interest capsule matching)"""

  def make_module(self):
    return _MINDModule(self.ctx, self)

  def build_loss(self, outputs, batch):
    total, losses = super().build_loss(outputs, batch)
    cfg = self.config.mind
    if cfg.max_interests_simi < 1.0:
      ui = _normalize(outputs['user_interests'])
      sims = jnp.einsum('bkd,bjd->bkj', ui, ui)
      k = sims.shape[1]
      off = ~jnp.eye(k, dtype=bool)
      msk = outputs['interests_mask']
      pair_mask = off[None] * (msk[:, :, None] * msk[:, None, :])
      reg = jnp.sum(jnp.maximum(sims - cfg.max_interests_simi, 0.0)
                    * pair_mask) / jnp.maximum(jnp.sum(pair_mask), 1e-9)
      losses['interest_simi_reg'] = reg
      total = total + reg
    return total, losses

  def export_outputs(self, outputs):
    return {'user_emb': outputs['user_tower_emb'],
            'user_interests': outputs['user_interests'],
            'item_emb': outputs['item_tower_emb']}


class _MultiTowerRecallModule(nn.Module):
  ctx: Any
  model: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.multi_tower_recall
    user_in = il.group_concat(pulled, batch, ctx.group_features('user'))
    item_in = il.group_concat(pulled, batch, ctx.group_features('item'))
    user_emb = _tower_dnn(cfg.user_tower.dnn, 'user_dnn')(
        user_in, training)
    item_emb = _tower_dnn(cfg.item_tower.dnn, 'item_dnn')(
        item_in, training)
    both = jnp.concatenate([user_emb, item_emb], axis=1)
    final = DNN.from_config(cfg.final_dnn, name='final_dnn')(both, training)
    logits = nn.Dense(1, name='logits')(final)[:, 0]
    return {'user_tower_emb': user_emb, 'item_tower_emb': item_emb,
            'logits': logits, 'probs': jax.nn.sigmoid(logits)}


@register_model('MultiTowerRecall')
class MultiTowerRecall(MatchModel):
  """reference: model/multi_tower_recall.py"""

  def make_module(self):
    return _MultiTowerRecallModule(self.ctx, self)

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    loss = L.sigmoid_cross_entropy(labels, outputs['logits'], weights)
    return loss, {'sigmoid_cross_entropy': loss}


class _DropoutNetModule(nn.Module):
  ctx: Any
  model: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.dropoutnet
    def group(name):
      if name in ctx.groups:
        return il.group_concat(pulled, batch, ctx.group_features(name))
      return None
    u_content = group('user_content')
    u_pref = group('user_preference')
    i_content = group('item_content')
    i_pref = group('item_preference')
    outs = []
    for name, x, dnn_cfg, rate in [
        ('user_content', u_content, cfg.user_content, 0.0),
        ('user_preference', u_pref, cfg.user_preference,
         cfg.user_dropout_rate),
        ('item_content', i_content, cfg.item_content, 0.0),
        ('item_preference', i_pref, cfg.item_preference,
         cfg.item_dropout_rate)]:
      if x is None:
        outs.append(None)
        continue
      if rate > 0 and training:
        # dropout whole preference vectors (cold-start simulation)
        keep = jax.random.bernoulli(
            self.make_rng('dropout'), 1 - rate, (x.shape[0], 1))
        x = x * keep
      outs.append(DNN.from_config(dnn_cfg, name=name)(x, training))
    u_in = jnp.concatenate([o for o in outs[:2] if o is not None], axis=1)
    i_in = jnp.concatenate([o for o in outs[2:] if o is not None], axis=1)
    user_emb = _tower_dnn(cfg.user_tower, 'user_tower')(
        u_in, training)
    item_emb = _tower_dnn(cfg.item_tower, 'item_tower')(
        i_in, training)
    sim = jnp.sum(_normalize(user_emb) * _normalize(item_emb), axis=1)
    return {'user_tower_emb': user_emb, 'item_tower_emb': item_emb,
            'logits': sim, 'probs': jax.nn.sigmoid(sim)}


@register_model('DropoutNet')
class DropoutNet(MatchModel):
  """reference: model/dropoutnet.py (cold-start two-tower)"""

  def make_module(self):
    return _DropoutNetModule(self.ctx, self)

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    cfg = self.config.dropoutnet
    sl = cfg.softmax_loss
    loss = L.softmax_loss_with_negative_mining(
        outputs['user_tower_emb'], outputs['item_tower_emb'], labels,
        weights,
        num_negative_samples=int(sl.num_negative_samples) or 4,
        margin=sl.margin, gamma=sl.gamma,
        coef=sl.coefficient_of_support_vector)
    return loss, {'softmax_neg_mining': loss}
