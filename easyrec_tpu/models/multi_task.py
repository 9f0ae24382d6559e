"""Multi-task model zoo: SimpleMultiTask, MMoE, ESMM, DBMTL, PLE.

Reference: easy_rec/python/model/{simple_multi_task,mmoe,esmm,dbmtl,ple}.py
and multi_task_model.py:19-303 (tower-label matching, per-task losses and
metrics with _tower suffixes, task-space indicator reweighting, Bayesian
relation towers).
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.layers.dnn import DNN
from easyrec_tpu.layers.multi_task import CGCLayer, MMoE as MMoELayer
from easyrec_tpu.losses import losses as L
from easyrec_tpu.models.base import BaseModel, register_model
from easyrec_tpu.models.seq_input import group_input
from easyrec_tpu.protos import models_pb2

LossType = models_pb2.LossType


class MultiTaskModel(BaseModel):
  """Base: per-task towers, losses, metric inputs."""

  def task_towers(self):
    raise NotImplementedError

  def _tower_label(self, tower, idx) -> str:
    if tower.label_name:
      return tower.label_name
    return self.ctx.label_fields[idx]

  def build_loss(self, outputs, batch):
    weights = self.sample_weights(batch)
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for idx, tower in enumerate(self.task_towers()):
      name = tower.tower_name
      label = batch['label.%s' % self._tower_label(tower, idx)]
      logits = outputs['logits_%s' % name]
      w = weights if tower.use_sample_weight else jnp.ones_like(weights)
      # task-space indicator reweighting (multi_task_model.py:204-226)
      if tower.task_space_indicator_label:
        ind = batch['label.%s' % tower.task_space_indicator_label]
        w = w * (tower.in_task_space_weight * (ind > 0) +
                 tower.out_task_space_weight * (ind <= 0))
      tower_losses = list(tower.losses)
      if not tower_losses:
        lt = tower.loss_type
        value = self._tower_loss(lt, None, tower, label, logits, w)
        losses['%s_loss_%s' % (LossType.Name(lt).lower(), name)] = value
        total = total + tower.weight * value
        continue
      # explicit per-tower loss list (multi_task_model.py:241-270)
      for loss_cfg in tower_losses:
        lt = loss_cfg.loss_type
        if lt == LossType.ORDER_CALIBRATE_LOSS:
          # cross-tower order calibration: a task's probability must not
          # exceed its relation towers' (relu(p_t - p_rel), reference
          # multi_task_model.py:241-251); plain mean, no sample weight
          probs_t = outputs['probs_%s' % name]
          for rel in list(getattr(tower, 'relation_tower_names', [])):
            probs_r = outputs['probs_%s' % rel]
            value = jnp.mean(jax.nn.relu(probs_t - probs_r))
            losses['order_calibrate_loss_%s_%s' % (rel, name)] = value
            total = total + loss_cfg.weight * value
          continue
        which = loss_cfg.WhichOneof('loss_param')
        params = getattr(loss_cfg, which) if which else None
        value = self._tower_loss(lt, params, tower, label, logits, w)
        losses['%s_loss_%s' % (LossType.Name(lt).lower(), name)] = value
        total = total + tower.weight * loss_cfg.weight * value
    return total, losses

  def _tower_loss(self, lt, params, tower, label, logits, w):
    if lt == LossType.L2_LOSS:
      return L.l2_loss(label, logits, w)
    if lt == LossType.SIGMOID_L2_LOSS:
      squeezed = logits[..., 0] if logits.ndim > 1 else logits
      return L.l2_loss(label, jax.nn.sigmoid(squeezed), w)
    if lt == LossType.BINARY_FOCAL_LOSS:
      kw = {}
      if params is not None:
        kw = dict(gamma=params.gamma,
                  alpha=params.alpha if params.HasField('alpha') else None,
                  label_smoothing=params.label_smoothing,
                  ohem_ratio=params.ohem_ratio)
      return L.binary_focal_loss(label, logits, w, **kw)
    if lt == LossType.F1_REWEIGHTED_LOSS:
      kw = {}
      if params is not None:
        kw = dict(f1_beta_square=params.f1_beta_square,
                  label_smoothing=params.label_smoothing)
      return L.f1_reweighted_loss(label, logits, w, **kw)
    # CLASSIFICATION / CROSS_ENTROPY / fall-back
    if int(tower.num_class) > 1:
      return L.softmax_cross_entropy(label, logits, w)
    return L.sigmoid_cross_entropy(label, logits, w)

  def metric_inputs(self, outputs, batch):
    # primary task drives the shared streaming metrics; per-task metrics
    # come from metric_inputs_per_task
    towers = self.task_towers()
    tower = towers[0]
    label = batch['label.%s' % self._tower_label(tower, 0)]
    return {'labels': label,
            'probs': outputs['probs_%s' % tower.tower_name],
            'preds': outputs['probs_%s' % tower.tower_name],
            'weights': self.sample_weights(batch)}

  def metric_inputs_per_task(self, outputs, batch):
    out = {}
    for idx, tower in enumerate(self.task_towers()):
      name = tower.tower_name
      out[name] = {
          'labels': batch['label.%s' % self._tower_label(tower, idx)],
          'probs': outputs['probs_%s' % name],
          'preds': outputs['probs_%s' % name],
          'weights': self.sample_weights(batch),
      }
    return out

  def export_outputs(self, outputs):
    return {k: v for k, v in outputs.items()
            if k.startswith('probs_') or k.startswith('logits_')}


def _tower_head(tower_cfg, x, training, name):
  """Task tower: optional DNN -> logits."""
  h = x
  if tower_cfg.HasField('dnn') and len(tower_cfg.dnn.hidden_units):
    h = DNN.from_config(tower_cfg.dnn, name='%s_dnn' % name)(h, training)
  n_out = max(int(tower_cfg.num_class), 1)
  return nn.Dense(n_out, name='%s_logits' % name)(h)[:, 0] \
      if n_out == 1 else nn.Dense(n_out, name='%s_logits' % name)(h)


class _SimpleMultiTaskModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.simple_multi_task
    group = next(iter(ctx.groups))
    x = group_input(ctx, pulled, batch, group, training)
    out = {}
    for tower in cfg.task_towers:
      logits = _tower_head(tower, x, training, tower.tower_name)
      out['logits_%s' % tower.tower_name] = logits
      out['probs_%s' % tower.tower_name] = jax.nn.sigmoid(logits) \
          if int(tower.num_class) <= 1 else jax.nn.softmax(logits, -1)
    return out


@register_model('SimpleMultiTask')
class SimpleMultiTask(MultiTaskModel):
  """reference: model/simple_multi_task.py"""

  def task_towers(self):
    return list(self.config.simple_multi_task.task_towers)

  def make_module(self):
    return _SimpleMultiTaskModule(self.ctx)


class _MMoEModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.mmoe
    group = next(iter(ctx.groups))
    x = group_input(ctx, pulled, batch, group, training)
    towers = list(cfg.task_towers)
    expert_cfg = cfg.expert_dnn if cfg.HasField('expert_dnn') else \
        cfg.experts[0].dnn
    num_expert = int(cfg.num_expert) or len(cfg.experts)
    task_feats = MMoELayer(
        num_task=len(towers), num_expert=num_expert,
        expert_hidden_units=tuple(expert_cfg.hidden_units),
        expert_activation=expert_cfg.activation or 'relu',
        name='mmoe')(x, training)
    out = {}
    for tower, feat in zip(towers, task_feats):
      logits = _tower_head(tower, feat, training, tower.tower_name)
      out['logits_%s' % tower.tower_name] = logits
      out['probs_%s' % tower.tower_name] = jax.nn.sigmoid(logits) \
          if int(tower.num_class) <= 1 else jax.nn.softmax(logits, -1)
    return out


@register_model('MMoE')
class MMoE(MultiTaskModel):
  """reference: model/mmoe.py:14"""

  def task_towers(self):
    return list(self.config.mmoe.task_towers)

  def make_module(self):
    return _MMoEModule(self.ctx)


class _ESMMModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.esmm
    feats = []
    if len(cfg.groups) > 0:
      from easyrec_tpu.models.seq_input import group_input_fn
      gi = group_input_fn(ctx, pulled, batch, training)
      for tower in cfg.groups:
        x = gi(tower.input)
        feats.append(DNN.from_config(tower.dnn,
                                     name='group_%s' % tower.input)(
                                         x, training))
      x = jnp.concatenate(feats, axis=1) if len(feats) > 1 else feats[0]
    else:
      group = next(iter(ctx.groups))
      x = group_input(ctx, pulled, batch, group, training)
    ctr_logits = _tower_head(cfg.ctr_tower, x, training, 'ctr')
    cvr_logits = _tower_head(cfg.cvr_tower, x, training, 'cvr')
    p_ctr = jax.nn.sigmoid(ctr_logits)
    p_cvr = jax.nn.sigmoid(cvr_logits)
    return {
        'logits_%s' % cfg.ctr_tower.tower_name: ctr_logits,
        'probs_%s' % cfg.ctr_tower.tower_name: p_ctr,
        'logits_%s' % cfg.cvr_tower.tower_name: cvr_logits,
        'probs_%s' % cfg.cvr_tower.tower_name: p_cvr,
        'probs_ctcvr': p_ctr * p_cvr,
    }


@register_model('ESMM')
class ESMM(MultiTaskModel):
  """reference: model/esmm.py:17 — CVR supervised through p(ctr)*p(cvr)."""

  def task_towers(self):
    return [self.config.esmm.ctr_tower, self.config.esmm.cvr_tower]

  def metric_task_names(self):
    # auc_ctr + conditional auc_cvr (clicked space) + auc_ctcvr over
    # all impressions — the reference reports all three (esmm.py:58-98)
    return [self.config.esmm.ctr_tower.tower_name,
            self.config.esmm.cvr_tower.tower_name, 'ctcvr']

  def build_loss(self, outputs, batch):
    cfg = self.config.esmm
    weights = self.sample_weights(batch)
    ctr_tower, cvr_tower = cfg.ctr_tower, cfg.cvr_tower
    ctr_label = batch['label.%s' % self._tower_label(ctr_tower, 0)]
    cvr_label = batch['label.%s' % self._tower_label(cvr_tower, 1)]
    ctr_loss = L.sigmoid_cross_entropy(
        ctr_label, outputs['logits_%s' % ctr_tower.tower_name], weights)
    # ctcvr: probability-space CE on p_ctr * p_cvr vs ctr*cvr label
    ctcvr_label = ctr_label * cvr_label
    p = jnp.clip(outputs['probs_ctcvr'], 1e-7, 1 - 1e-7)
    per = -(ctcvr_label * jnp.log(p) + (1 - ctcvr_label) * jnp.log(1 - p))
    ctcvr_loss = jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights),
                                                      1e-9)
    total = ctr_tower.weight * ctr_loss + cvr_tower.weight * ctcvr_loss
    return total, {'ctr_loss': ctr_loss, 'ctcvr_loss': ctcvr_loss}

  def metric_inputs_per_task(self, outputs, batch):
    cfg = self.config.esmm
    weights = self.sample_weights(batch)
    ctr_tower, cvr_tower = cfg.ctr_tower, cfg.cvr_tower
    ctr_label = batch['label.%s' % self._tower_label(ctr_tower, 0)]
    cvr_label = batch['label.%s' % self._tower_label(cvr_tower, 1)]
    out = {
        ctr_tower.tower_name: {
            'labels': ctr_label,
            'probs': outputs['probs_%s' % ctr_tower.tower_name],
            'preds': outputs['probs_%s' % ctr_tower.tower_name],
            'weights': weights},
        # cvr AUC evaluated in the clicked space (reference esmm.py)
        cvr_tower.tower_name: {
            'labels': cvr_label,
            'probs': outputs['probs_%s' % cvr_tower.tower_name],
            'preds': outputs['probs_%s' % cvr_tower.tower_name],
            'weights': weights * ctr_label},
        'ctcvr': {
            'labels': ctr_label * cvr_label,
            'probs': outputs['probs_ctcvr'],
            'preds': outputs['probs_ctcvr'],
            'weights': weights},
    }
    return out

  def make_module(self):
    return _ESMMModule(self.ctx)


class _DBMTLModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.dbmtl
    if cfg.HasField('bottom_cmbf'):
      # multimodal bottom (reference dbmtl.py + dbmtl_cmbf configs)
      from easyrec_tpu.models.rank_extra import CMBFEncoder
      x = CMBFEncoder(ctx, cfg.bottom_cmbf, name='bottom_cmbf')(
          batch, pulled, training)
    elif cfg.HasField('bottom_uniter'):
      from easyrec_tpu.models.rank_extra import UniterEncoder
      x = UniterEncoder(ctx, cfg.bottom_uniter, name='bottom_uniter')(
          batch, pulled, training)
    else:
      group = next(iter(ctx.groups))
      x = group_input(ctx, pulled, batch, group, training)
    if cfg.HasField('bottom_dnn') and len(cfg.bottom_dnn.hidden_units):
      x = DNN.from_config(cfg.bottom_dnn, name='bottom_dnn')(x, training)
    towers = list(cfg.task_towers)
    if int(cfg.num_expert) > 0:
      task_feats = MMoELayer(
          num_task=len(towers), num_expert=int(cfg.num_expert),
          expert_hidden_units=tuple(cfg.expert_dnn.hidden_units),
          name='mmoe')(x, training)
    else:
      task_feats = [x] * len(towers)

    # bayesian DAG: each tower's relation dnn consumes its ancestors'
    # tower features (dbmtl relation_tower_names)
    tower_feature: Dict[str, jnp.ndarray] = {}
    out = {}
    for tower, feat in zip(towers, task_feats):
      name = tower.tower_name
      h = feat
      if tower.HasField('dnn') and len(tower.dnn.hidden_units):
        h = DNN.from_config(tower.dnn, name='%s_dnn' % name)(h, training)
      rel_inputs = [h] + [tower_feature[r]
                          for r in tower.relation_tower_names
                          if r in tower_feature]
      if len(rel_inputs) > 1 or (tower.HasField('relation_dnn') and
                                 len(tower.relation_dnn.hidden_units)):
        h = jnp.concatenate(rel_inputs, axis=1)
        if tower.HasField('relation_dnn') and \
            len(tower.relation_dnn.hidden_units):
          h = DNN.from_config(tower.relation_dnn,
                              name='%s_relation' % name)(h, training)
      tower_feature[name] = h
      n_out = max(int(tower.num_class), 1)
      logits = nn.Dense(n_out, name='%s_logits' % name)(h)
      logits = logits[:, 0] if n_out == 1 else logits
      out['logits_%s' % name] = logits
      out['probs_%s' % name] = jax.nn.sigmoid(logits) if n_out <= 1 \
          else jax.nn.softmax(logits, -1)
    return out


@register_model('DBMTL')
class DBMTL(MultiTaskModel):
  """reference: model/dbmtl.py (Bayesian task DAG)"""

  def task_towers(self):
    return list(self.config.dbmtl.task_towers)

  def make_module(self):
    return _DBMTLModule(self.ctx)


class _PLEModule(nn.Module):
  ctx: Any

  @nn.compact
  def __call__(self, batch, pulled, training: bool = False):
    ctx = self.ctx
    il = ctx.input_layer
    cfg = ctx.model_config.ple
    group = next(iter(ctx.groups))
    x = group_input(ctx, pulled, batch, group, training)
    towers = list(cfg.task_towers)
    num_task = len(towers)
    task_inputs = [x] * num_task
    shared = x
    nets = list(cfg.extraction_networks)
    for li, net in enumerate(nets):
      final = (li == len(nets) - 1)
      task_inputs, shared = CGCLayer(
          num_task=num_task,
          expert_num_per_task=int(net.expert_num_per_task) or 1,
          share_num=int(net.share_num) or 1,
          task_hidden_units=tuple(net.task_expert_net.hidden_units),
          share_hidden_units=tuple(
              net.share_expert_net.hidden_units
              if net.HasField('share_expert_net')
              else net.task_expert_net.hidden_units),
          final_layer=final,
          name='cgc_%s' % (net.network_name or str(li)))(
              task_inputs, shared, training)
    out = {}
    for tower, feat in zip(towers, task_inputs):
      logits = _tower_head(tower, feat, training, tower.tower_name)
      out['logits_%s' % tower.tower_name] = logits
      out['probs_%s' % tower.tower_name] = jax.nn.sigmoid(logits) \
          if int(tower.num_class) <= 1 else jax.nn.softmax(logits, -1)
    return out


@register_model('PLE')
class PLE(MultiTaskModel):
  """reference: model/ple.py:13 (progressive layered extraction)"""

  def task_towers(self):
    return list(self.config.ple.task_towers)

  def make_module(self):
    return _PLEModule(self.ctx)
