"""Backbone-driven composite models: model_class 'RankModel' /
'MatchModel' / 'MultiTaskModel' with a `backbone` block DAG and
`model_params` (reference: easy_rec/python/model/{rank_model,match_model,
multi_task_model}.py used with model_params + protos/backbone.proto, e.g.
samples' *_backbone_on_* configs).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import DNN
from easyrec_tpu.models.backbone import BackboneModule, _flatten
from easyrec_tpu.models.base import RankModel as RankBase
from easyrec_tpu.models.base import register_model
from easyrec_tpu.models.match import MatchModel as MatchBase
from easyrec_tpu.models.multi_task import MultiTaskModel as MultiTaskBase
from easyrec_tpu.protos import common_pb2, models_pb2

Similarity = common_pb2.Similarity
LossType = models_pb2.LossType


def _as_tensor(out):
  if isinstance(out, (list, tuple)):
    vals = _flatten(list(out))
    return jnp.concatenate(vals, axis=-1) if len(vals) > 1 else vals[0]
  return out


class _BackboneRankModule(nn.Module):
  ctx: Any
  num_logits: int

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    out = BackboneModule(self.ctx, self.ctx.model_config.backbone,
                         name='backbone')(batch, pulled, training)
    x = _as_tensor(out)
    if x.ndim == 2 and x.shape[-1] == self.num_logits:
      logits = x          # backbone already produced the logits
    else:
      logits = nn.Dense(self.num_logits, name='logits')(x)
    return {'raw_logits': logits}


@register_model('RankModel')
class BackboneRankModel(RankBase):
  """Backbone DAG -> logits (reference rank_model.py with backbone)."""

  def make_module(self):
    from easyrec_tpu.models.rank import _WithPrediction
    return _WithPrediction(self,
                           _BackboneRankModule(self.ctx, self.logits_dim()))


class _BackboneMatchModule(nn.Module):
  ctx: Any
  model: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    mp = self.ctx.model_config.model_params
    out = BackboneModule(self.ctx, self.ctx.model_config.backbone,
                         name='backbone')(batch, pulled, training)
    if not isinstance(out, (list, tuple)):
      raise ValueError('MatchModel backbone must declare output_blocks '
                       'for the user and item towers')
    u_idx = int(mp.user_tower_idx_in_output)
    i_idx = int(mp.item_tower_idx_in_output)
    user_emb, item_emb = out[u_idx], out[i_idx]
    result = {'user_tower_emb': user_emb, 'item_tower_emb': item_emb}
    if not self.model.is_listwise:
      if mp.simi_func == Similarity.COSINE:
        un = user_emb / jnp.maximum(
            jnp.linalg.norm(user_emb, axis=-1, keepdims=True), 1e-9)
        it = item_emb / jnp.maximum(
            jnp.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-9)
        sim = jnp.sum(un * it, axis=1)
      else:
        sim = jnp.sum(user_emb * item_emb, axis=1)
      logits = sim / (float(mp.temperature) or 1.0)
      result['logits'] = logits
      result['probs'] = jax.nn.sigmoid(logits)
    return result


@register_model('MatchModel')
class BackboneMatchModel(MatchBase):
  """Backbone DAG with user/item output blocks -> two-tower matching."""

  def _simi_cfg(self):
    return self.config.model_params

  def make_module(self):
    return _BackboneMatchModule(self.ctx, self)


class _BackboneMultiTaskModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    mc = self.ctx.model_config
    towers = list(mc.model_params.task_towers)
    out = BackboneModule(self.ctx, mc.backbone, name='backbone')(
        batch, pulled, training)
    if isinstance(out, (list, tuple)):
      task_inputs = list(out)
      if len(task_inputs) < len(towers):
        raise ValueError('backbone produced %d outputs for %d task towers'
                         % (len(task_inputs), len(towers)))
    else:
      task_inputs = [out] * len(towers)

    result = {}
    tower_feats = {}
    # first pass: tower DNN features
    for i, tower in enumerate(towers):
      name = tower.tower_name
      h = task_inputs[i]
      if tower.HasField('dnn') and len(tower.dnn.hidden_units):
        h = DNN.from_config(tower.dnn, name='%s_dnn' % name)(h, training)
      tower_feats[name] = h
    # second pass: bayesian relation chains + logits
    for i, tower in enumerate(towers):
      name = tower.tower_name
      h = tower_feats[name]
      if tower.relation_tower_names:
        rel = [tower_feats[r] for r in tower.relation_tower_names]
        h = jnp.concatenate([h] + rel, axis=-1)
        if tower.HasField('relation_dnn') and \
                len(tower.relation_dnn.hidden_units):
          h = DNN.from_config(tower.relation_dnn,
                              name='%s_relation_dnn' % name)(h, training)
      n_out = max(int(tower.num_class), 1)
      logits = nn.Dense(n_out, name='%s_logits' % name)(h)
      logits = logits[:, 0] if n_out == 1 else logits
      result['logits_%s' % name] = logits
      result['probs_%s' % name] = jax.nn.sigmoid(logits) if n_out <= 1 \
          else jax.nn.softmax(logits, axis=-1)
    return result


@register_model('MultiTaskModel')
class BackboneMultiTaskModel(MultiTaskBase):
  """Backbone DAG -> per-task (Bayes) towers from model_params."""

  def task_towers(self):
    return list(self.config.model_params.task_towers)

  def make_module(self):
    return _BackboneMultiTaskModule(self.ctx)
