"""Device-side embedding ops: fused gather, combiners, input-layer assembly.

The pull/combine split is the sparse-update boundary: `pull_embeddings`
gathers rows OUTSIDE the loss function so the backward pass produces
gradients w.r.t. the gathered rows ([B, totK, dim]) instead of a dense
table-sized gradient. The sparse optimizers in easyrec_tpu/optim/sparse.py
then scatter row-wise updates — the TPU analog of the reference's
sparse/lazy optimizer path (compat/optimizers.py:294-316, AdamAsync).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from easyrec_tpu.features.embedding_layout import EmbeddingLayout


def pack_ids(layout: EmbeddingLayout,
             batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
  """Concatenate every feature's ids (+ its table's row offset) into one
  [B, totK] int32 pack per fused table. One cheap device-side concat buys
  one big gather per dim-group."""
  packs = {}
  for key, table in layout.tables.items():
    cols = []
    for use in table.uses:
      ids = batch['feat.%s.ids' % use.feature]
      cols.append(ids.astype(jnp.int32) + jnp.int32(use.offset))
    packs[key] = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
  return packs


def pull_embeddings(tables: Dict[str, jnp.ndarray],
                    packs: Dict[str, jnp.ndarray]
                    ) -> Dict[str, jnp.ndarray]:
  """Fused gather: one table.take per dim-group -> [B, totK, dim]."""
  return {key: jnp.take(tables[key], packs[key], axis=0) for key in packs}


def combine(rows: jnp.ndarray, weights: jnp.ndarray,
            combiner: str) -> jnp.ndarray:
  """Reduce [B, K, dim] weighted rows to [B, dim].

  sum/mean become a tiny matmul-like contraction; max masks padding with
  -inf. Weight 0 marks padding slots.
  """
  if combiner == 'sum':
    return jnp.einsum('bk,bkd->bd', weights, rows)
  if combiner == 'mean':
    total = jnp.einsum('bk,bkd->bd', weights, rows)
    denom = jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-9)
    return total / denom
  if combiner == 'max':
    mask = (weights > 0)[:, :, None]
    masked = jnp.where(mask, rows * weights[:, :, None], -jnp.inf)
    out = jnp.max(masked, axis=1)
    # all-padding rows -> 0
    return jnp.where(jnp.isfinite(out), out, 0.0)
  if combiner == 'min':
    mask = (weights > 0)[:, :, None]
    masked = jnp.where(mask, rows * weights[:, :, None], jnp.inf)
    out = jnp.min(masked, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)
  raise ValueError('unknown combiner %r' % combiner)


class InputLayer:
  """Assembles per-feature embeddings from the fused pulls.

  Replaces the reference InputLayer/feature-column lookup
  (easy_rec/python/layers/input_layer.py:245,
  compat/feature_column/feature_column.py:384-414) with static slicing of
  the fused [B, totK, dim] gather results.
  """

  def __init__(self, layout: EmbeddingLayout, specs):
    self.layout = layout
    self.specs = specs

  def feature_embedding(self, pulled: Dict[str, jnp.ndarray],
                        batch: Dict[str, jnp.ndarray],
                        fname: str, role: str = 'deep') -> jnp.ndarray:
    """[B, dim] combined embedding for one categorical feature."""
    spec = self.specs[fname]
    key, use = self.layout.feature_use[(fname, role)]
    rows = jax.lax.slice_in_dim(pulled[key], use.start, use.start + use.k,
                                axis=1)
    weights = batch['feat.%s.weights' % fname]
    combiner = spec.combiner if role == 'deep' else 'sum'
    return combine(rows, weights, combiner)

  def sequence_embedding(self, pulled: Dict[str, jnp.ndarray],
                         batch: Dict[str, jnp.ndarray],
                         fname: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """([B, L, dim], mask [B, L]) for one sequence feature."""
    key, use = self.layout.feature_use[(fname, 'deep')]
    rows = jax.lax.slice_in_dim(pulled[key], use.start, use.start + use.k,
                                axis=1)
    mask = batch['feat.%s.mask' % fname]
    return rows * mask[:, :, None], mask

  def dense_feature(self, batch: Dict[str, jnp.ndarray],
                    fname: str) -> jnp.ndarray:
    return batch['feat.%s.dense' % fname]

  def group_embeddings(self, pulled, batch, feature_names,
                       role: str = 'deep'):
    """List of per-feature [B, d_f] tensors for a feature group (dense
    features pass through)."""
    outs = []
    for fname in feature_names:
      spec = self.specs[fname]
      if spec.kind == 'dense':
        outs.append(self.dense_feature(batch, fname))
      elif spec.kind == 'sequence':
        # sequences used in a flat group are mean-pooled over valid steps
        seq, mask = self.sequence_embedding(pulled, batch, fname)
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        outs.append(seq.sum(axis=1) / denom)
      else:
        outs.append(self.feature_embedding(pulled, batch, fname, role))
    return outs

  def group_concat(self, pulled, batch, feature_names,
                   role: str = 'deep') -> jnp.ndarray:
    """[B, sum(d_f)] concatenation of a feature group."""
    outs = self.group_embeddings(pulled, batch, feature_names, role)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

  def group_stack(self, pulled, batch, feature_names,
                  role: str = 'deep') -> jnp.ndarray:
    """[B, F, dim] stack (requires equal dims) for FM/AutoInt/DLRM-style
    field-wise interactions."""
    outs = self.group_embeddings(pulled, batch, feature_names, role)
    dims = {o.shape[-1] for o in outs}
    if len(dims) != 1:
      raise ValueError('group_stack needs equal embedding dims, got %s'
                       % sorted(dims))
    return jnp.stack(outs, axis=1)

  def wide_logits(self, pulled, batch, feature_names) -> jnp.ndarray:
    """[B, wide_dim] summed wide terms (reference wide columns are
    sum-combined embeddings, feature_column.py:596-623)."""
    outs = []
    for fname in feature_names:
      spec = self.specs[fname]
      if spec.kind == 'dense':
        continue
      outs.append(self.feature_embedding(pulled, batch, fname, 'wide'))
    if not outs:
      raise ValueError('wide group has no categorical features')
    return sum(outs)
