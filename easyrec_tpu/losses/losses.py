"""Loss library: every LossType in protos/models.proto, in jnp.

Reference: easy_rec/python/builders/loss_builder.py:28-330 and loss/*.py.
All losses take per-sample weights (0 marks padded rows) and reduce to a
weighted mean unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from easyrec_tpu.protos import models_pb2

LossType = models_pb2.LossType


def _weighted_mean(values, weights):
  weights = jnp.asarray(weights, values.dtype)
  total = jnp.sum(weights)
  return jnp.sum(values * weights) / jnp.maximum(total, 1e-9)


def sigmoid_cross_entropy(labels, logits, weights=1.0,
                          label_smoothing: float = 0.0):
  labels = labels.astype(logits.dtype)
  if label_smoothing > 0:
    labels = labels * (1 - label_smoothing) + 0.5 * label_smoothing
  per = jnp.maximum(logits, 0) - logits * labels + \
      jnp.log1p(jnp.exp(-jnp.abs(logits)))
  return _weighted_mean(per, weights)


def softmax_cross_entropy(labels, logits, weights=1.0):
  """labels: int class ids [B]; logits [B, C]."""
  logp = jax.nn.log_softmax(logits, axis=-1)
  per = -jnp.take_along_axis(logp, labels.astype(jnp.int32)[:, None],
                             axis=-1)[:, 0]
  return _weighted_mean(per, weights)


def l2_loss(labels, preds, weights=1.0):
  per = 0.5 * jnp.square(preds - labels.astype(preds.dtype))
  return _weighted_mean(per, weights)


def sigmoid_l2_loss(labels, logits, weights=1.0):
  return l2_loss(labels, jax.nn.sigmoid(logits), weights)


def binary_focal_loss(labels, logits, weights=1.0, gamma: float = 2.0,
                      alpha=None, label_smoothing: float = 0.0,
                      ohem_ratio: float = 1.0):
  labels = labels.astype(logits.dtype)
  if label_smoothing > 0:
    labels = labels * (1 - label_smoothing) + 0.5 * label_smoothing
  p = jax.nn.sigmoid(logits)
  ce = jnp.maximum(logits, 0) - logits * labels + \
      jnp.log1p(jnp.exp(-jnp.abs(logits)))
  p_t = p * labels + (1 - p) * (1 - labels)
  mod = jnp.power(1.0 - p_t, gamma)
  if alpha is not None:
    a_t = alpha * labels + (1 - alpha) * (1 - labels)
    mod = mod * a_t
  if ohem_ratio < 1.0:
    w = jnp.broadcast_to(jnp.asarray(weights, logits.dtype),
                         logits.shape)
    return _ohem_mean(mod * ce, w, ohem_ratio)
  return _weighted_mean(mod * ce, weights)


def f1_reweighted_loss(labels, logits, weights=1.0,
                       f1_beta_square: float = 1.0,
                       label_smoothing: float = 0.0):
  labels_f = labels.astype(logits.dtype)
  if label_smoothing > 0:
    labels_f = labels_f * (1 - label_smoothing) + 0.5 * label_smoothing
  p = jax.nn.sigmoid(logits)
  per = -(f1_beta_square * labels_f * jnp.log(p + 1e-9) +
          (1 - labels_f) * jnp.log(1 - p + 1e-9) * (1 - p))
  return _weighted_mean(per, weights)


def _ohem_mean(per, weights, ohem_ratio: float):
  """Online hard example mining (reference loss/focal_loss.py:79-93):
  keep the top ceil(ratio * n_valid) weighted losses (and only positive
  ones), mean over the kept set. Static-shape formulation: sort the
  full array and gate by the cumulative count of valid entries."""
  flat = (per * weights).ravel()
  valid = ((jnp.asarray(weights) > 0) & (per > 0)).ravel()
  valid_f = valid.astype(flat.dtype)
  order = jnp.argsort(-flat)
  sorted_loss = flat[order]
  sorted_valid = valid_f[order]
  n_keep = jnp.ceil(jnp.sum(valid_f) * ohem_ratio)
  keep = sorted_valid * (jnp.cumsum(sorted_valid) <= n_keep)
  return jnp.sum(sorted_loss * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def _pairwise_diffs(scores, labels, weights, session_ids=None):
  """Build [B, B] pairwise (pos - neg) logit diffs + pair mask."""
  diff = scores[:, None] - scores[None, :]
  label_diff = labels[:, None] - labels[None, :]
  pair_mask = (label_diff > 0).astype(scores.dtype)
  if session_ids is not None:
    same = (session_ids[:, None] == session_ids[None, :])
    pair_mask = pair_mask * same.astype(scores.dtype)
  w = jnp.asarray(weights, scores.dtype)
  if w.ndim == 0:
    w = jnp.ones_like(scores) * w
  pair_w = pair_mask * w[:, None] * (w[None, :] > 0)
  return diff, pair_w


def pairwise_loss(labels, logits, weights=1.0, margin: float = 0.0,
                  session_ids=None, temperature: float = 1.0,
                  ohem_ratio: float = 1.0):
  diff, pair_w = _pairwise_diffs(logits / temperature, labels, weights,
                                 session_ids)
  per = jnp.log1p(jnp.exp(-(diff - margin)))
  if ohem_ratio < 1.0:
    return _ohem_mean(per, pair_w, ohem_ratio)
  return jnp.sum(per * pair_w) / jnp.maximum(jnp.sum(pair_w), 1e-9)


def pairwise_logistic_loss(labels, logits, weights=1.0,
                           temperature: float = 1.0,
                           hinge_margin=None, session_ids=None,
                           ohem_ratio: float = 1.0):
  diff, pair_w = _pairwise_diffs(logits / temperature, labels, weights,
                                 session_ids)
  if hinge_margin is not None:
    keep = (diff < hinge_margin).astype(diff.dtype)
    pair_w = pair_w * keep
  per = jnp.log1p(jnp.exp(-diff))
  if ohem_ratio < 1.0:
    return _ohem_mean(per, pair_w, ohem_ratio)
  return jnp.sum(per * pair_w) / jnp.maximum(jnp.sum(pair_w), 1e-9)


def pairwise_focal_loss(labels, logits, weights=1.0, gamma: float = 2.0,
                        alpha=None, hinge_margin: float = 1.0,
                        temperature: float = 1.0, session_ids=None,
                        ohem_ratio: float = 1.0):
  diff, pair_w = _pairwise_diffs(logits / temperature, labels, weights,
                                 session_ids)
  keep = (diff < hinge_margin).astype(diff.dtype)
  pair_w = pair_w * keep
  p = jax.nn.sigmoid(diff)
  per = -jnp.power(1 - p, gamma) * jnp.log(p + 1e-9)
  if alpha is not None:
    per = per * alpha
  if ohem_ratio < 1.0:
    return _ohem_mean(per, pair_w, ohem_ratio)
  return jnp.sum(per * pair_w) / jnp.maximum(jnp.sum(pair_w), 1e-9)


def pairwise_hinge_loss(labels, logits, weights=1.0, margin: float = 1.0,
                        temperature: float = 1.0, session_ids=None,
                        label_is_logits: bool = True,
                        use_label_margin: bool = True,
                        use_exponent: bool = False,
                        ohem_ratio: float = 1.0):
  """Reference loss/pairwise_loss.py pairwise_hinge_loss: the margin is
  the label difference by default (use_label_margin), labels scale with
  temperature when they are logits, and use_exponent applies
  relu(exp(diff) - 1)."""
  labels = labels.astype(logits.dtype)
  scores = logits / temperature
  lbl = labels / temperature if label_is_logits else labels
  if use_exponent:
    lbl = jax.nn.sigmoid(lbl)
    scores = jax.nn.sigmoid(scores)
  diff, pair_w = _pairwise_diffs(scores, lbl, weights, session_ids)
  if use_label_margin:
    hinge_in = (lbl[:, None] - lbl[None, :]) - diff
  else:
    hinge_in = margin - diff
  if use_exponent:
    per = jax.nn.relu(jnp.exp(jnp.clip(hinge_in, -88.0, 88.0)) - 1.0)
  else:
    per = jax.nn.relu(hinge_in)
  if ohem_ratio < 1.0:
    return _ohem_mean(per, pair_w, ohem_ratio)
  return jnp.sum(per * pair_w) / jnp.maximum(jnp.sum(pair_w), 1e-9)


def jrc_loss(labels, logits2, session_ids, weights=1.0, alpha: float = 0.5,
             same_label_loss: bool = True):
  """Joint ranking & calibration (CIKM'22). logits2: [B, 2].
  same_label_loss=False removes same-label competitors from each
  sample's in-session softmax (reference loss/jrc_loss.py:72-85)."""
  labels = labels.astype(jnp.int32)
  ce = softmax_cross_entropy(labels, logits2, weights)
  # in-session listwise: for each sample, softmax its class logit over the
  # session's samples
  b = logits2.shape[0]
  same = (session_ids[:, None] == session_ids[None, :]).astype(
      logits2.dtype)
  mask_diag = same
  if not same_label_loss:
    eye = jnp.eye(b, dtype=bool)
    same_lbl = (labels[:, None] == labels[None, :]) & ~eye
    mask_diag = mask_diag * (1.0 - same_lbl.astype(logits2.dtype))
  logits_pos = logits2[:, 1]
  logits_neg = logits2[:, 0]

  def session_softmax_ce(vec, is_target):
    scores = jnp.where(mask_diag > 0, vec[None, :], -1e9)
    logp = jax.nn.log_softmax(scores, axis=1)
    diag = jnp.diagonal(logp)
    return -(diag * is_target)

  w = jnp.asarray(weights, logits2.dtype)
  if w.ndim == 0:
    w = jnp.ones((b,), logits2.dtype) * w
  pos_t = (labels == 1).astype(logits2.dtype) * w
  neg_t = (labels == 0).astype(logits2.dtype) * w
  ge_loss = (jnp.sum(session_softmax_ce(logits_pos, pos_t)) +
             jnp.sum(session_softmax_ce(logits_neg, neg_t))) / \
      jnp.maximum(jnp.sum(w), 1e-9)
  return alpha * ce + (1 - alpha) * ge_loss


def ziln_loss(labels, logits3, weights=1.0, max_sigma: float = 5.0,
              max_log_clip_value: float = 20.0,
              classification_weight: float = 1.0,
              regression_weight: float = 1.0,
              mu_regularization: float = 0.0,
              sigma_regularization: float = 0.0):
  """Zero-inflated lognormal for LTV regression. logits3: [B, 3] =
  (class logit, mu, sigma). Reference: loss/zero_inflated_lognormal.py
  + ZILNLoss params (protos: mu/sigma regularization, log clip,
  classification/regression weights)."""
  labels = labels.astype(logits3.dtype)
  positive = (labels > 0).astype(logits3.dtype)
  class_logit = logits3[..., 0]
  class_loss = jnp.maximum(class_logit, 0) - class_logit * positive + \
      jnp.log1p(jnp.exp(-jnp.abs(class_logit)))
  mu = logits3[..., 1]
  sigma = jnp.minimum(jax.nn.softplus(logits3[..., 2]), max_sigma)
  sigma = jnp.maximum(sigma, 1e-6)
  safe_labels = positive * labels + (1 - positive)
  log_l = jnp.clip(jnp.log(safe_labels), -max_log_clip_value,
                   max_log_clip_value)
  reg_loss = -positive * (-0.5 * jnp.square((log_l - mu) / sigma) -
                          jnp.log(sigma * safe_labels * 2.5066282746))
  total = _weighted_mean(classification_weight * class_loss +
                         regression_weight * reg_loss, weights)
  if mu_regularization:
    total = total + mu_regularization * jnp.mean(jnp.square(mu))
  if sigma_regularization:
    total = total + sigma_regularization * jnp.mean(jnp.square(sigma))
  return total


def kl_divergence_loss(soft_labels, logits, weights=1.0,
                       temperature: float = 1.0,
                       labels_are_logits: bool = True):
  """Binary KL for knowledge distillation."""
  if labels_are_logits:
    p = jax.nn.sigmoid(soft_labels / temperature)
  else:
    p = soft_labels
  q_logit = logits / temperature
  per = p * (jnp.log(p + 1e-9) - jax.nn.log_sigmoid(q_logit)) + \
      (1 - p) * (jnp.log(1 - p + 1e-9) - jax.nn.log_sigmoid(-q_logit))
  return _weighted_mean(per, weights) * temperature ** 2


def listwise_rank_loss(labels, logits, session_ids, weights=1.0,
                       temperature: float = 1.0,
                       label_is_logits: bool = False,
                       transform_fn: str = ''):
  """Softmax CE of in-session score distribution vs label distribution.
  transform_fn (dotted path) preprocesses the label vector (reference
  loss/listwise_loss.py)."""
  if transform_fn:
    from easyrec_tpu.utils.registry import load_by_path
    labels = load_by_path(transform_fn)(labels)
  same = (session_ids[:, None] == session_ids[None, :])
  scores = jnp.where(same, (logits / temperature)[None, :], -1e9)
  logp = jax.nn.log_softmax(scores, axis=1)
  if label_is_logits:
    lbl = jnp.where(same, labels[None, :], -1e9)
    target = jax.nn.softmax(lbl, axis=1)
  else:
    lbl = jnp.where(same, labels[None, :], 0.0)
    target = lbl / jnp.maximum(lbl.sum(axis=1, keepdims=True), 1e-9)
  per = -jnp.sum(target * logp, axis=1)
  return _weighted_mean(per, weights)


def listwise_distill_loss(labels, logits, session_ids, weights=1.0,
                          temperature: float = 1.0,
                          label_clip_max_value: float = 512.0,
                          transform_fn: str = ''):
  """Distill a teacher's ranking positions: labels are positions
  (1 = best); default transform log1p(max) - log(pos) converts them to
  relevance (reference loss/listwise_loss.py:102-150; scale_logits'
  learned affine lives model-side, not in this pure fn)."""
  lbl = jnp.clip(labels.astype(logits.dtype), 1.0, label_clip_max_value)
  if transform_fn:
    from easyrec_tpu.utils.registry import load_by_path
    lbl = load_by_path(transform_fn)(lbl)
  else:
    lbl = jnp.log1p(label_clip_max_value) - jnp.log(lbl)
  return listwise_rank_loss(lbl, logits, session_ids, weights,
                            temperature=temperature,
                            label_is_logits=False)


def _log1p_sum_exp(logits, mask):
  """log(1 + sum_i mask_i * exp(logits_i)) per row, overflow-safe:
  gamma*ap terms reach +126 at gamma=32 (exp -> inf -> NaN grads), so
  shift by the row max like logsumexp with an implicit 0 logit."""
  live = mask > 0
  masked = jnp.where(live, logits, -jnp.inf)
  m = jnp.maximum(jnp.max(masked, axis=1), 0.0)
  s = jnp.exp(-m) + jnp.sum(
      jnp.where(live, jnp.exp(masked - m[:, None]), 0.0), axis=1)
  return m + jnp.log(s)


def circle_loss(embeddings, labels, weights=1.0, margin: float = 0.25,
                gamma: float = 32.0):
  """Circle loss over L2-normalized embeddings; labels are group ids."""
  emb = embeddings / jnp.maximum(
      jnp.linalg.norm(embeddings, axis=1, keepdims=True), 1e-9)
  sim = emb @ emb.T
  b = sim.shape[0]
  same = (labels[:, None] == labels[None, :])
  eye = jnp.eye(b, dtype=bool)
  pos_mask = (same & ~eye).astype(sim.dtype)
  neg_mask = (~same).astype(sim.dtype)
  ap = jnp.maximum(1 + margin - sim, 0.0)
  an = jnp.maximum(sim + margin, 0.0)
  logit_p = -gamma * ap * (sim - (1 - margin))
  logit_n = gamma * an * (sim - margin)
  loss_p = _log1p_sum_exp(logit_p, pos_mask)
  loss_n = _log1p_sum_exp(logit_n, neg_mask)
  return _weighted_mean(loss_p + loss_n, weights)


def multi_similarity_loss(embeddings, labels, weights=1.0,
                          alpha: float = 2.0, beta: float = 50.0,
                          lamb: float = 1.0, eps: float = 0.1):
  emb = embeddings / jnp.maximum(
      jnp.linalg.norm(embeddings, axis=1, keepdims=True), 1e-9)
  sim = emb @ emb.T
  b = sim.shape[0]
  same = (labels[:, None] == labels[None, :])
  eye = jnp.eye(b, dtype=bool)
  pos_mask = (same & ~eye).astype(sim.dtype)
  neg_mask = (~same).astype(sim.dtype)
  pos_term = _log1p_sum_exp(-alpha * (sim - lamb), pos_mask) / alpha
  neg_term = _log1p_sum_exp(beta * (sim - lamb), neg_mask) / beta
  return _weighted_mean(pos_term + neg_term, weights)


def softmax_loss_with_negative_mining(user_emb, item_emb, labels,
                                      weights=1.0, num_negative_samples=4,
                                      margin: float = 0.0,
                                      gamma: float = 1.0,
                                      coef: float = 1.0,
                                      rng=None):
  """In-batch shuffled negatives + support-vector softmax
  (reference loss/softmax_loss_with_negative_mining.py)."""
  b = user_emb.shape[0]
  u = user_emb / jnp.maximum(
      jnp.linalg.norm(user_emb, axis=1, keepdims=True), 1e-9)
  v = item_emb / jnp.maximum(
      jnp.linalg.norm(item_emb, axis=1, keepdims=True), 1e-9)
  pos = jnp.sum(u * v, axis=1, keepdims=True)
  # negatives: roll the item embeddings
  negs = [jnp.sum(u * jnp.roll(v, k + 1, axis=0), axis=1, keepdims=True)
          for k in range(num_negative_samples)]
  logits = jnp.concatenate([pos - margin] + negs, axis=1) * gamma
  labels_pos = jnp.zeros((b,), jnp.int32)
  logp = jax.nn.log_softmax(logits, axis=-1)
  per = -logp[:, 0] * labels.astype(logits.dtype)
  w = jnp.asarray(weights, logits.dtype)
  if w.ndim == 0:
    w = jnp.ones((b,)) * w
  w = w * labels.astype(logits.dtype)
  return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-9) * coef
