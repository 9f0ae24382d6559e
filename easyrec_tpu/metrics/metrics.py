"""Streaming evaluation metrics.

AUC & max-F1 run fully on device as histogram accumulators (the TPU-friendly
formulation of the reference's fast_auc, core/metrics.py:111); GAUC and
session AUC group on the host exactly like the reference py_func
implementation (core/metrics.py:59-110, 260-299).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

AUC_BINS = 8192


# -- device-side streaming states -------------------------------------------


def init_metric_state(name: str) -> Dict[str, jnp.ndarray]:
  if name in ('auc', 'max_f1'):
    return {'pos': jnp.zeros(AUC_BINS, jnp.float32),
            'neg': jnp.zeros(AUC_BINS, jnp.float32)}
  # moment accumulators
  return {'sum': jnp.zeros((), jnp.float32),
          'sum_sq': jnp.zeros((), jnp.float32),
          'count': jnp.zeros((), jnp.float32)}


def update_auc(state, labels, probs, weights):
  idx = jnp.clip((probs * AUC_BINS).astype(jnp.int32), 0, AUC_BINS - 1)
  w = weights.astype(jnp.float32)
  lbl = labels.astype(jnp.float32)
  pos = state['pos'].at[idx].add(w * lbl)
  neg = state['neg'].at[idx].add(w * (1.0 - lbl))
  return {'pos': pos, 'neg': neg}


def auc_result(state) -> float:
  pos = np.asarray(state['pos'], np.float64)
  neg = np.asarray(state['neg'], np.float64)
  total_pos, total_neg = pos.sum(), neg.sum()
  if total_pos == 0 or total_neg == 0:
    return 0.5
  # rank-sum (Mann-Whitney U) over histogram bins with tie correction
  neg_below = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
  u = np.sum(pos * (neg_below + 0.5 * neg))
  return float(u / (total_pos * total_neg))


def max_f1_result(state) -> float:
  pos = np.asarray(state['pos'], np.float64)
  neg = np.asarray(state['neg'], np.float64)
  total_pos = pos.sum()
  if total_pos == 0:
    return 0.0
  # thresholding at each bin boundary (predict positive >= bin)
  tp = np.cumsum(pos[::-1])[::-1]
  fp = np.cumsum(neg[::-1])[::-1]
  fn = total_pos - tp
  f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1e-9)
  return float(f1.max())


def update_error(state, labels, preds, weights):
  err = (preds - labels).astype(jnp.float32)
  w = weights.astype(jnp.float32)
  return {'sum': state['sum'] + jnp.sum(jnp.abs(err) * w),
          'sum_sq': state['sum_sq'] + jnp.sum(jnp.square(err) * w),
          'count': state['count'] + jnp.sum(w)}


def update_accuracy(state, labels, preds, weights):
  correct = (preds == labels).astype(jnp.float32)
  w = weights.astype(jnp.float32)
  return {'sum': state['sum'] + jnp.sum(correct * w),
          'sum_sq': state['sum_sq'],
          'count': state['count'] + jnp.sum(w)}


def update_topk_recall(state, logits, k: int, labels, weights):
  """Recall@k over candidate columns: column 0 (or the diagonal caller
  passes as col 0) is the positive; hit when it ranks in the top-k.
  Used for recall_in_batch@k / recall_neg_sam@k (reference
  match_model.py:287-317)."""
  pos = logits[:, 0]
  rank = jnp.sum((logits[:, 1:] > pos[:, None]).astype(jnp.float32),
                 axis=1)
  hit = (rank < k).astype(jnp.float32)
  w = weights.astype(jnp.float32) * labels.astype(jnp.float32)
  return {'sum': state['sum'] + jnp.sum(hit * w),
          'sum_sq': state['sum_sq'],
          'count': state['count'] + jnp.sum(w)}


def update_binary_counts(state, labels, preds, weights):
  """For precision/recall at threshold 0.5: sum=tp, sum_sq=fp, count=pos."""
  w = weights.astype(jnp.float32)
  pred_pos = (preds >= 0.5).astype(jnp.float32)
  lbl = labels.astype(jnp.float32)
  return {'sum': state['sum'] + jnp.sum(pred_pos * lbl * w),
          'sum_sq': state['sum_sq'] + jnp.sum(pred_pos * (1 - lbl) * w),
          'count': state['count'] + jnp.sum(lbl * w)}


# -- host-side grouped AUC ---------------------------------------------------


def numpy_auc(labels: np.ndarray, probs: np.ndarray) -> float:
  order = np.argsort(probs, kind='mergesort')
  sorted_labels = labels[order]
  sorted_probs = probs[order]
  n = len(labels)
  # average ranks with ties
  ranks = np.empty(n, np.float64)
  i = 0
  while i < n:
    j = i
    while j + 1 < n and sorted_probs[j + 1] == sorted_probs[i]:
      j += 1
    ranks[i:j + 1] = 0.5 * (i + j) + 1.0
    i = j + 1
  n_pos = sorted_labels.sum()
  n_neg = n - n_pos
  if n_pos == 0 or n_neg == 0:
    return float('nan')
  return float((ranks[sorted_labels > 0].sum() -
                n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def grouped_auc(uids: np.ndarray, labels: np.ndarray, probs: np.ndarray,
                reduction: str = 'mean') -> float:
  """Per-group AUC, reduced (reference gauc, core/metrics.py:260)."""
  order = np.argsort(uids, kind='mergesort')
  uids, labels, probs = uids[order], labels[order], probs[order]
  boundaries = np.nonzero(np.concatenate(
      [[True], uids[1:] != uids[:-1], [True]]))[0]
  aucs, wts = [], []
  for lo, hi in zip(boundaries[:-1], boundaries[1:]):
    lbl = labels[lo:hi]
    n_pos = lbl.sum()
    if n_pos == 0 or n_pos == len(lbl):
      continue
    aucs.append(numpy_auc(lbl, probs[lo:hi]))
    if reduction == 'mean_by_sample_num':
      wts.append(hi - lo)
    elif reduction == 'mean_by_positive_num':
      wts.append(n_pos)
    else:
      wts.append(1.0)
  if not aucs:
    return 0.5
  return float(np.average(aucs, weights=wts))


def grouped_auc_from_hists(pos: np.ndarray, neg: np.ndarray,
                           reduction: str = 'mean') -> float:
  """Per-group AUC from score histograms (pos/neg counts per score
  bucket, [G, bins]): rank-sum over buckets with tie correction —
  the bucketized fast_auc formulation (reference core/metrics.py:111),
  accurate to ~1/bins."""
  n_pos = pos.sum(axis=1)
  n_neg = neg.sum(axis=1)
  ok = (n_pos > 0) & (n_neg > 0)
  if not ok.any():
    return 0.5
  pos, neg = pos[ok].astype(np.float64), neg[ok].astype(np.float64)
  n_pos, n_neg = n_pos[ok].astype(np.float64), n_neg[ok].astype(np.float64)
  cum_neg = np.cumsum(neg, axis=1) - neg          # negatives strictly below
  wins = (pos * (cum_neg + 0.5 * neg)).sum(axis=1)
  aucs = wins / (n_pos * n_neg)
  if reduction == 'mean_by_sample_num':
    wts = n_pos + n_neg
  elif reduction == 'mean_by_positive_num':
    wts = n_pos
  else:
    wts = np.ones_like(aucs)
  return float(np.average(aucs, weights=wts))


class GroupedMetricBuffer:
  """Bounded host-side buffer for ONE grouped metric field.

  Buffers (uid, label, prob) rows exactly up to `max_rows`
  (EASYREC_EVAL_HOST_BUFFER_ROWS, default 20M); past the bound it
  COMPACTS into per-group score histograms (`bins` buckets over [0,1])
  and keeps streaming — memory bounded by #groups x bins instead of
  rows, AUC within ~1/bins of exact. Addresses the unbounded-eval-RAM
  failure mode of the reference's py_func gauc (core/metrics.py:59-110
  buffers everything too)."""

  def __init__(self, max_rows: int = None, bins: int = 128):
    import os as _os
    self.max_rows = max_rows if max_rows is not None else int(
        _os.environ.get('EASYREC_EVAL_HOST_BUFFER_ROWS', 20_000_000))
    self.bins = bins
    self.raw = {'uids': [], 'labels': [], 'probs': []}
    self.n = 0
    self._uid_index = None     # uid -> row in the hist arrays
    self._pos = None           # [G_alloc, bins] int64
    self._neg = None

  @property
  def histogram_mode(self) -> bool:
    return self._uid_index is not None

  def add(self, uids, labels, probs):
    uids = np.asarray(uids)
    labels = np.asarray(labels)
    probs = np.asarray(probs)
    if not self.histogram_mode:
      self.raw['uids'].append(uids)
      self.raw['labels'].append(labels)
      self.raw['probs'].append(probs)
      self.n += len(uids)
      if self.n > self.max_rows:
        self._compact()
      return
    self._hist_add(uids, labels, probs)

  def _compact(self):
    import logging
    logging.warning(
        'grouped-metric host buffer exceeded %d rows: switching to '
        'bucketized per-group AUC (%d bins, ~%.1e absolute error); '
        'set EASYREC_EVAL_HOST_BUFFER_ROWS or eval_config.num_examples '
        'for exact values', self.max_rows, self.bins, 1.0 / self.bins)
    self._uid_index = {}
    self._pos = np.zeros((0, self.bins), np.int64)
    self._neg = np.zeros((0, self.bins), np.int64)
    raw = self.raw
    self.raw = {'uids': [], 'labels': [], 'probs': []}
    if raw['uids']:
      self._hist_add(np.concatenate(raw['uids']),
                     np.concatenate(raw['labels']),
                     np.concatenate(raw['probs']))

  def _hist_add(self, uids, labels, probs):
    uniq, codes = np.unique(uids, return_inverse=True)
    rows = np.empty(len(uniq), np.int64)
    grow = [u for u in uniq if u not in self._uid_index]
    if grow:
      base = len(self._uid_index)
      for i, u in enumerate(grow):
        self._uid_index[u] = base + i
      extra = np.zeros((len(grow), self.bins), np.int64)
      self._pos = np.concatenate([self._pos, extra])
      self._neg = np.concatenate([self._neg, extra.copy()])
    for i, u in enumerate(uniq):
      rows[i] = self._uid_index[u]
    b = np.clip((np.asarray(probs, np.float64) * self.bins).astype(
        np.int64), 0, self.bins - 1)
    r = rows[codes]
    lbl = np.asarray(labels) > 0
    np.add.at(self._pos, (r[lbl], b[lbl]), 1)
    np.add.at(self._neg, (r[~lbl], b[~lbl]), 1)

  def result(self, reduction: str = 'mean') -> float:
    if self.histogram_mode:
      return grouped_auc_from_hists(self._pos, self._neg, reduction)
    if not self.raw['uids']:
      return 0.5
    return grouped_auc(np.concatenate(self.raw['uids']),
                       np.concatenate(self.raw['labels']),
                       np.concatenate(self.raw['probs']), reduction)


# -- metric collection --------------------------------------------------------


class MetricsCollection:
  """Builds streaming metric updates from EvalConfig.metrics_set.

  Device metrics update inside the jitted eval step; grouped metrics
  (gauc / session_auc) buffer predictions on host.
  """

  def __init__(self, metrics_configs, label_name: str = None):
    self.configs = []
    self.host_fields = set()
    for m in metrics_configs:
      which = m.WhichOneof('metric')
      cfg = getattr(m, which)
      self.configs.append((which, cfg))
      if which == 'gauc':
        self.host_fields.add(cfg.uid_field)
      elif which == 'session_auc':
        self.host_fields.add(cfg.session_id_field)

  def init_states(self):
    states = {}
    for which, cfg in self.configs:
      if which in ('auc', 'max_f1'):
        states.setdefault('auc_hist', init_metric_state('auc'))
      elif which in ('mean_absolute_error', 'mean_squared_error',
                     'root_mean_squared_error'):
        states.setdefault('error', init_metric_state('error'))
      elif which == 'accuracy':
        states.setdefault('accuracy', init_metric_state('accuracy'))
      elif which in ('precision', 'recall'):
        states.setdefault('binary', init_metric_state('binary'))
      elif which in ('recall_at_topk', 'precision_at_topk'):
        states.setdefault('topk_%d' % int(cfg.topk),
                          init_metric_state('topk'))
    return states

  def update_states(self, states, labels, probs, preds, weights,
                    extra: Optional[dict] = None):
    """jit-safe: update all device metric states."""
    out = dict(states)
    extra = extra or {}
    cand = extra.get('neg_sam_logits')
    if cand is None and 'in_batch_logits' in extra:
      ib = extra['in_batch_logits']
      pos = jnp.diagonal(ib)
      cand = jnp.concatenate([pos[:, None], ib], axis=1)
    for key in states:
      if key.startswith('topk_') and cand is not None:
        k = int(key.split('_')[1])
        out[key] = update_topk_recall(states[key], cand, k, labels,
                                      weights)
    if 'auc_hist' in states:
      out['auc_hist'] = update_auc(states['auc_hist'], labels, probs,
                                   weights)
    if 'error' in states:
      out['error'] = update_error(states['error'], labels, preds, weights)
    if 'accuracy' in states:
      # integer preds are class ids (multiclass argmax); float preds are
      # probabilities/scores and threshold at 0.5 (binary)
      if preds is not None and jnp.issubdtype(preds.dtype, jnp.integer):
        cls = preds.astype(jnp.float32)
      else:
        score = preds if preds is not None else probs
        cls = (score >= 0.5).astype(jnp.float32)
      out['accuracy'] = update_accuracy(states['accuracy'], labels, cls,
                                        weights)
    if 'binary' in states:
      out['binary'] = update_binary_counts(states['binary'], labels, probs,
                                           weights)
    return out

  def results(self, states, host_buffers: Optional[dict] = None) -> dict:
    """host_buffers: {field_name: GroupedMetricBuffer} for grouped
    metrics (gauc/session_auc), or None when no host metric is set."""
    res = {}
    for which, cfg in self.configs:
      if which == 'auc':
        res['auc'] = auc_result(states['auc_hist'])
      elif which == 'max_f1':
        res['max_f1'] = max_f1_result(states['auc_hist'])
      elif which == 'mean_absolute_error':
        s = states['error']
        res['mean_absolute_error'] = float(
            np.asarray(s['sum']) / max(float(np.asarray(s['count'])), 1e-9))
      elif which == 'mean_squared_error':
        s = states['error']
        res['mean_squared_error'] = float(
            np.asarray(s['sum_sq']) /
            max(float(np.asarray(s['count'])), 1e-9))
      elif which == 'root_mean_squared_error':
        s = states['error']
        res['root_mean_squared_error'] = float(np.sqrt(
            np.asarray(s['sum_sq']) /
            max(float(np.asarray(s['count'])), 1e-9)))
      elif which == 'accuracy':
        s = states['accuracy']
        res['accuracy'] = float(
            np.asarray(s['sum']) / max(float(np.asarray(s['count'])), 1e-9))
      elif which == 'precision':
        s = states['binary']
        tp, fp = float(np.asarray(s['sum'])), float(np.asarray(s['sum_sq']))
        res['precision'] = tp / max(tp + fp, 1e-9)
      elif which == 'recall':
        s = states['binary']
        tp, pos = float(np.asarray(s['sum'])), float(np.asarray(s['count']))
        res['recall'] = tp / max(pos, 1e-9)
      elif which in ('recall_at_topk', 'precision_at_topk'):
        k = int(cfg.topk)
        s = states.get('topk_%d' % k)
        if s is not None:
          hits = float(np.asarray(s['sum']))
          cnt = float(np.asarray(s['count']))
          if which == 'recall_at_topk':
            res['recall@%d' % k] = hits / max(cnt, 1e-9)
          else:
            # precision@k: one relevant item per row -> hit contributes
            # 1/k (reference tf.metrics precision_at_k semantics)
            res['precision@%d' % k] = hits / max(cnt * k, 1e-9)
      elif which == 'gauc' and host_buffers is not None:
        res['gauc'] = host_buffers[cfg.uid_field].result(
            cfg.reduction or 'mean')
      elif which == 'session_auc' and host_buffers is not None:
        res['session_auc'] = host_buffers[cfg.session_id_field].result(
            cfg.reduction or 'mean')
    return res
