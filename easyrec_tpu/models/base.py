"""Model base classes: registry, rank/match/multitask bases.

Mirrors the reference contract (easy_rec/python/model/easy_rec_model.py:49,
rank_model.py:19, match_model.py:18, multi_task_model.py:19): a registry
keyed by model_class, per-model predict graph, loss builder, metric inputs
and export outputs — re-expressed as a flax module + pure jnp loss fns.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from easyrec_tpu.features.embedding_layout import EmbeddingLayout
from easyrec_tpu.losses import losses as L
from easyrec_tpu.ops import embedding as emb_ops
from easyrec_tpu.protos import data_pb2, models_pb2
from easyrec_tpu.utils.registry import MODELS

LossType = models_pb2.LossType
WideOrDeep = data_pb2.WideOrDeep


@dataclasses.dataclass
class ModelContext:
  """Everything a model needs, precomputed from the pipeline config."""
  model_config: object                   # EasyRecModel proto
  specs: Dict[str, object]               # feature name -> FeatureSpec
  layout: EmbeddingLayout
  label_fields: List[str]
  compute_dtype: object = jnp.float32

  def __post_init__(self):
    self.input_layer = emb_ops.InputLayer(self.layout, self.specs)
    self.groups = {g.group_name: g for g in self.model_config.feature_groups}
    self.seq_att_groups = {g.group_name: g
                           for g in self.model_config.seq_att_groups}
    # seq_att groups may also be declared inside feature_groups
    for g in self.model_config.feature_groups:
      for sg in g.sequence_features:
        self.seq_att_groups.setdefault(sg.group_name or g.group_name, sg)

  def group_features(self, name: str) -> List[str]:
    if name not in self.groups:
      raise KeyError('unknown feature group %r (have %s)' %
                     (name, sorted(self.groups)))
    return list(self.groups[name].feature_names)

  def deep_feature_names(self) -> List[str]:
    names = []
    for g in self.model_config.feature_groups:
      if g.wide_deep in (WideOrDeep.DEEP, WideOrDeep.WIDE_AND_DEEP):
        names.extend(g.feature_names)
    for g in self.seq_att_groups.values():
      for m in g.seq_att_map:
        names.extend(m.key)
        names.extend(m.hist_seq)
        names.extend(m.aux_hist_seq)
    return list(dict.fromkeys(names))

  def wide_feature_names(self) -> List[str]:
    names = []
    for g in self.model_config.feature_groups:
      if g.wide_deep in (WideOrDeep.WIDE, WideOrDeep.WIDE_AND_DEEP):
        names.extend(g.feature_names)
    return list(dict.fromkeys(names))

  def seq_feature_names(self) -> List[str]:
    names = []
    for fname, spec in self.specs.items():
      if spec.kind == 'sequence':
        names.append(fname)
    return names




def wide_output_dim(model_config) -> int:
  """Wide embedding dim from the active model message (default 1)."""
  which = model_config.WhichOneof('model')
  if which is None:
    return 1
  sub = getattr(model_config, which)
  fields = {f.name for f in sub.DESCRIPTOR.fields}
  if 'wide_output_dim' in fields:
    return max(int(sub.wide_output_dim), 1)
  return 1


def build_context(pipeline_config, specs, wide_dim: int = None,
                  compute_dtype=jnp.float32) -> ModelContext:
  mc = pipeline_config.model_config
  ctx_tmp = ModelContext.__new__(ModelContext)
  ctx_tmp.model_config = mc
  ctx_tmp.specs = specs
  ctx_tmp.groups = {g.group_name: g for g in mc.feature_groups}
  ctx_tmp.seq_att_groups = {g.group_name: g for g in mc.seq_att_groups}
  for g in mc.feature_groups:
    for sg in g.sequence_features:
      ctx_tmp.seq_att_groups.setdefault(sg.group_name or g.group_name, sg)
  deep = ModelContext.deep_feature_names(ctx_tmp)
  wide = ModelContext.wide_feature_names(ctx_tmp)
  # only embed features that exist in specs (groups may reference dense)
  layout = EmbeddingLayout(
      specs, deep_features=[f for f in deep if f in specs],
      wide_features=[f for f in wide if f in specs],
      wide_output_dim=wide_dim if wide_dim is not None else wide_output_dim(mc),
      seq_features=[])
  return ModelContext(
      model_config=mc, specs=specs, layout=layout,
      label_fields=list(pipeline_config.data_config.label_fields),
      compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# base model
# ---------------------------------------------------------------------------


class BaseModel:
  """One model family: builds the flax module + loss + metric inputs."""

  def __init__(self, ctx: ModelContext):
    self.ctx = ctx
    self.config = ctx.model_config

  # subclasses return an nn.Module whose __call__(batch, pulled, training)
  # returns a dict of output tensors
  def make_module(self) -> nn.Module:
    raise NotImplementedError

  def build_loss(self, outputs, batch) -> Tuple[jnp.ndarray, Dict]:
    raise NotImplementedError

  def metric_inputs(self, outputs, batch) -> Dict:
    """Returns dict(labels=..., probs=..., preds=..., weights=...)."""
    raise NotImplementedError

  def export_outputs(self, outputs) -> Dict:
    return outputs

  @property
  def label_name(self) -> str:
    if self.config.label_name:
      return self.config.label_name
    return self.ctx.label_fields[0]

  def labels(self, batch) -> jnp.ndarray:
    return batch['label.%s' % self.label_name]

  @staticmethod
  def sample_weights(batch) -> jnp.ndarray:
    return batch['sample_weight']


class RankModel(BaseModel):
  """Binary / multi-class / regression ranking base
  (reference rank_model.py:19-560)."""

  @property
  def num_class(self) -> int:
    return max(int(self.config.num_class), 1)

  @property
  def loss_type(self):
    return self.config.loss_type

  def logits_dim(self) -> int:
    if self.loss_type == LossType.ZILN_LOSS:
      return 3
    if self.loss_type == LossType.JRC_LOSS:
      return 2
    return self.num_class

  def _prediction(self, logits):
    """logits -> dict with probs/preds following rank_model.py:57-130."""
    out = {'logits': logits}
    lt = self.loss_type
    if lt in (LossType.CLASSIFICATION, LossType.F1_REWEIGHTED_LOSS,
              LossType.BINARY_FOCAL_LOSS, LossType.PAIR_WISE_LOSS,
              LossType.PAIRWISE_FOCAL_LOSS, LossType.PAIRWISE_LOGISTIC_LOSS,
              LossType.PAIRWISE_HINGE_LOSS, LossType.BINARY_CROSS_ENTROPY_LOSS,
              LossType.CROSS_ENTROPY_LOSS, LossType.LISTWISE_RANK_LOSS,
              LossType.LISTWISE_DISTILL_LOSS):
      if self.num_class == 1:
        squeezed = logits[..., 0] if logits.ndim > 1 else logits
        out['logits'] = squeezed
        out['probs'] = jax.nn.sigmoid(squeezed)
      else:
        out['probs'] = jax.nn.softmax(logits, axis=-1)
        out['y'] = jnp.argmax(logits, axis=-1)
    elif lt == LossType.JRC_LOSS:
      out['probs'] = jax.nn.softmax(logits, axis=-1)[..., 1]
    elif lt == LossType.ZILN_LOSS:
      p = jax.nn.sigmoid(logits[..., 0])
      mu = logits[..., 1]
      sigma = jnp.minimum(jax.nn.softplus(logits[..., 2]), 5.0)
      out['probs'] = p
      out['y'] = p * jnp.exp(mu + 0.5 * jnp.square(sigma))
    elif lt in (LossType.L2_LOSS,):
      out['y'] = logits[..., 0] if logits.ndim > 1 else logits
    elif lt == LossType.SIGMOID_L2_LOSS:
      out['y'] = jax.nn.sigmoid(logits[..., 0] if logits.ndim > 1
                                else logits)
    else:
      squeezed = logits[..., 0] if logits.ndim > 1 else logits
      out['probs'] = jax.nn.sigmoid(squeezed)
    return out

  def _single_loss(self, loss_cfg, labels, outputs, weights, batch):
    lt = loss_cfg['type']
    logits = outputs['logits']
    params = loss_cfg.get('params')
    if lt in (LossType.CLASSIFICATION, LossType.BINARY_CROSS_ENTROPY_LOSS,
              LossType.CROSS_ENTROPY_LOSS):
      if self.num_class == 1:
        return L.sigmoid_cross_entropy(labels, logits, weights)
      return L.softmax_cross_entropy(labels, logits, weights)
    if lt == LossType.L2_LOSS:
      return L.l2_loss(labels, outputs.get('y', logits), weights)
    if lt == LossType.SIGMOID_L2_LOSS:
      return L.l2_loss(labels, outputs['y'], weights)
    if lt == LossType.BINARY_FOCAL_LOSS:
      kw = {}
      if params is not None:
        kw = dict(gamma=params.gamma,
                  alpha=params.alpha if params.HasField('alpha') else None,
                  label_smoothing=params.label_smoothing,
                  ohem_ratio=params.ohem_ratio)
      return L.binary_focal_loss(labels, logits, weights, **kw)
    if lt == LossType.F1_REWEIGHTED_LOSS:
      kw = {}
      if params is not None:
        kw = dict(f1_beta_square=params.f1_beta_square,
                  label_smoothing=params.label_smoothing)
      return L.f1_reweighted_loss(labels, logits, weights, **kw)
    if lt == LossType.PAIR_WISE_LOSS:
      sess = self._session(batch, params)
      kw = dict(margin=params.margin,
                temperature=params.temperature) \
          if params is not None else {}
      return L.pairwise_loss(labels, logits, weights, session_ids=sess,
                             **kw)
    if lt == LossType.PAIRWISE_LOGISTIC_LOSS:
      sess = self._session(batch, params)
      kw = {}
      if params is not None:
        kw = dict(temperature=params.temperature,
                  hinge_margin=params.hinge_margin
                  if params.HasField('hinge_margin') else None,
                  ohem_ratio=params.ohem_ratio)
      return L.pairwise_logistic_loss(labels, logits, weights,
                                      session_ids=sess, **kw)
    if lt == LossType.PAIRWISE_FOCAL_LOSS:
      sess = self._session(batch, params)
      kw = {}
      if params is not None:
        kw = dict(gamma=params.gamma,
                  alpha=params.alpha if params.HasField('alpha') else None,
                  hinge_margin=params.hinge_margin,
                  temperature=params.temperature,
                  ohem_ratio=params.ohem_ratio)
      return L.pairwise_focal_loss(labels, logits, weights,
                                   session_ids=sess, **kw)
    if lt == LossType.PAIRWISE_HINGE_LOSS:
      sess = self._session(batch, params)
      kw = {}
      if params is not None:
        kw = dict(temperature=params.temperature, margin=params.margin,
                  label_is_logits=params.label_is_logits,
                  use_label_margin=params.use_label_margin,
                  use_exponent=params.use_exponent,
                  ohem_ratio=params.ohem_ratio)
      return L.pairwise_hinge_loss(labels, logits, weights,
                                   session_ids=sess, **kw)
    if lt == LossType.JRC_LOSS:
      sess = self._session(batch, params, required=True)
      alpha = params.alpha if params is not None else 0.5
      same_lbl = params.same_label_loss if params is not None else True
      return L.jrc_loss(labels, logits, sess, weights, alpha=alpha,
                        same_label_loss=same_lbl)
    if lt == LossType.ZILN_LOSS:
      kw = {}
      if params is not None:
        kw = dict(max_sigma=params.max_sigma,
                  max_log_clip_value=params.max_log_clip_value,
                  classification_weight=params.classification_weight,
                  regression_weight=params.regression_weight,
                  mu_regularization=params.mu_regularization,
                  sigma_regularization=params.sigma_regularization)
      return L.ziln_loss(labels, logits, weights, **kw)
    if lt == LossType.LISTWISE_RANK_LOSS:
      sess = self._session(batch, params, required=True)
      kw = dict(temperature=params.temperature,
                label_is_logits=params.label_is_logits,
                transform_fn=params.transform_fn) \
          if params is not None else {}
      return L.listwise_rank_loss(labels, logits, sess, weights, **kw)
    if lt == LossType.LISTWISE_DISTILL_LOSS:
      sess = self._session(batch, params, required=True)
      kw = dict(temperature=params.temperature,
                label_clip_max_value=params.label_clip_max_value,
                transform_fn=params.transform_fn) \
          if params is not None else {}
      return L.listwise_distill_loss(labels, logits, sess, weights, **kw)
    raise ValueError('unsupported loss type %s for rank model' % lt)

  def _session(self, batch, params, required: bool = False):
    name = getattr(params, 'session_name', '') if params is not None else ''
    if name:
      key = 'field.%s' % name
      if key in batch:
        return batch[key]
      key = 'label.%s' % name
      if key in batch:
        return batch[key]
    if required:
      raise ValueError('loss requires session_name field in batch')
    return None

  def _loss_configs(self):
    """[{'type':..., 'weight':..., 'params':...}] from model config."""
    if len(self.config.losses) > 0:
      out = []
      for loss in self.config.losses:
        which = loss.WhichOneof('loss_param')
        out.append({'type': loss.loss_type, 'weight': loss.weight,
                    'params': getattr(loss, which) if which else None,
                    'learn': bool(loss.learn_loss_weight),
                    'name': loss.loss_name or
                    LossType.Name(loss.loss_type)})
      return out
    return [{'type': self.loss_type, 'weight': 1.0, 'params': None,
             'learn': False,
             'name': LossType.Name(self.loss_type)}]

  def _kd_losses(self, outputs, batch, weights):
    """Knowledge-distillation losses (reference easy_rec_model.proto:51-87
    KD message + loss_builder.py:228-330): student prediction vs a
    teacher signal carried in the batch (field.<soft_label_name>)."""
    out = {}
    for i, kd in enumerate(self.config.kd):
      pred = outputs.get(kd.pred_name) if kd.pred_name else None
      if pred is None:
        pred = outputs['logits']
      soft_key = 'field.%s' % kd.soft_label_name
      if soft_key not in batch:
        soft_key = 'label.%s' % kd.soft_label_name
      soft = batch[soft_key]
      w = weights
      if kd.task_space_indicator_name:
        ind_key = 'field.%s' % kd.task_space_indicator_name
        if ind_key in batch:
          ind = batch[ind_key]
          try:
            thr = float(kd.task_space_indicator_value)
          except ValueError:
            thr = 0.0
          in_space = (ind > thr).astype(jnp.float32)
          w = w * (kd.in_task_space_weight * in_space +
                   kd.out_task_space_weight * (1.0 - in_space))
      t = float(kd.temperature) or 1.0
      pred_l = pred if kd.pred_is_logits else \
          jnp.log(jnp.clip(pred, 1e-9, 1.0 - 1e-9)) - \
          jnp.log1p(-jnp.clip(pred, 1e-9, 1.0 - 1e-9))
      soft_l = soft if kd.label_is_logits else \
          jnp.log(jnp.clip(soft, 1e-9, 1.0 - 1e-9)) - \
          jnp.log1p(-jnp.clip(soft, 1e-9, 1.0 - 1e-9))
      lt = kd.loss_type
      if lt == LossType.KL_DIVERGENCE_LOSS:
        p = jax.nn.sigmoid(soft_l / t)
        q = jax.nn.sigmoid(pred_l / t)
        kl = p * (jnp.log(jnp.clip(p, 1e-9, 1.0)) -
                  jnp.log(jnp.clip(q, 1e-9, 1.0))) + \
            (1 - p) * (jnp.log(jnp.clip(1 - p, 1e-9, 1.0)) -
                       jnp.log(jnp.clip(1 - q, 1e-9, 1.0)))
        value = jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1e-9) * t * t
      elif lt == LossType.L2_LOSS:
        value = L.l2_loss(soft, pred, w)
      elif lt == LossType.LISTWISE_DISTILL_LOSS:
        sess = batch.get('field.%s' % getattr(
            getattr(kd, kd.WhichOneof('loss_param') or 'listwise_distill_loss',
                    None), 'session_name', ''), None) \
            if kd.WhichOneof('loss_param') else None
        value = L.listwise_rank_loss(jax.nn.sigmoid(soft_l / t), pred_l,
                                     sess if sess is not None else
                                     jnp.zeros_like(w), w)
      else:  # CROSS_ENTROPY (binary, temperature-scaled)
        p = jax.nn.sigmoid(soft_l / t)
        value = L.sigmoid_cross_entropy(p, pred_l / t, w) * t * t
      name = kd.loss_name or ('kd_loss_%d' % i)
      out[name] = (value, float(kd.loss_weight) or 1.0)
    return out

  def build_loss(self, outputs, batch):
    labels = self.labels(batch)
    weights = self.sample_weights(batch)
    losses = {}
    terms = []
    learn_flags = []
    for cfg in self._loss_configs():
      value = self._single_loss(cfg, labels, outputs, weights, batch)
      losses[cfg['name']] = value
      terms.append((value, cfg['weight'], cfg['type']))
      learn_flags.append(cfg.get('learn', False))
    for name, (value, w) in self._kd_losses(outputs, batch,
                                            weights).items():
      losses[name] = value
      terms.append((value, w, None))
      learn_flags.append(False)
    strategy = self.config.loss_weight_strategy
    Strategy = models_pb2.EasyRecModel.LossWeightStrategy
    if strategy == Strategy.Uncertainty and 'uncertainty_w' in outputs \
            and len(terms) > 1:
      # learned homoscedastic weights: exp(-u)*L + 0.5*u, halved for L2
      # losses (reference rank_model.py:302-318). When some losses set
      # learn_loss_weight explicitly, ONLY those are learned; the rest
      # keep their fixed weight (rank_model.py:303-320).
      any_explicit = any(learn_flags)
      u = outputs['uncertainty_w']
      total = 0.0
      for i, (value, w, lt) in enumerate(terms):
        if any_explicit and not learn_flags[i]:
          total = total + w * value
          continue
        scale = 0.5 if lt in (LossType.L2_LOSS,
                              LossType.SIGMOID_L2_LOSS) else 1.0
        total = total + scale * jnp.exp(-u[i]) * value + 0.5 * u[i]
    elif strategy == Strategy.Random and 'random_loss_w' in outputs \
            and len(terms) > 1:
      w = outputs['random_loss_w']
      total = sum(w[i] * v for i, (v, _, _) in enumerate(terms))
    else:
      total = sum(w * v for v, w, _ in terms)
    return total, losses

  def metric_inputs(self, outputs, batch):
    return {
        'labels': self.labels(batch),
        'probs': outputs.get('probs'),
        'preds': outputs.get('y', outputs.get('probs')),
        'weights': self.sample_weights(batch),
    }

  def export_outputs(self, outputs):
    out = {}
    if 'probs' in outputs:
      out['probs'] = outputs['probs']
    if 'y' in outputs:
      out['y'] = outputs['y']
    if 'logits' in outputs:
      out['logits'] = outputs['logits']
    return out


def register_model(name: str):
  return MODELS.register(name)


def create_model(ctx: ModelContext) -> BaseModel:
  cls = MODELS.get(ctx.model_config.model_class)
  return cls(ctx)
