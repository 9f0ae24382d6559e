"""Vectorized host-side feature transforms: raw columns -> packed arrays.

Functional parity with the reference per-type preprocessors
(easy_rec/python/input/input.py:378-747) re-designed for static shapes:
every transform emits fixed-width numpy arrays ready for device transfer.
All string-heavy work goes through the native/arrow fused kernels in
easyrec_tpu/ops/hashing.py.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from easyrec_tpu.features.feature_spec import FeatureSpec, FeatureType
from easyrec_tpu.ops import hashing
from easyrec_tpu.utils import expr as expr_util
from easyrec_tpu.utils.registry import load_by_path


def _to_numpy_str(col) -> np.ndarray:
  """Column -> numpy object array of strings ('' for nulls)."""
  try:
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
      col = col.combine_chunks()
    if isinstance(col, pa.Array):
      if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = col.fill_null('') if col.null_count else col
        return col.to_numpy(zero_copy_only=False)
      return col.cast(pa.string()).fill_null('').to_numpy(
          zero_copy_only=False)
  except ImportError:
    pass
  arr = np.asarray(col)
  if arr.dtype.kind in ('f', 'i', 'u'):
    return arr.astype(str).astype(object)
  return arr.astype(object)


def _to_float(col, default: float = 0.0) -> np.ndarray:
  try:
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
      col = col.combine_chunks()
    if isinstance(col, pa.Array):
      if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
        return col.fill_null(default).to_numpy(
            zero_copy_only=False).astype(np.float32)
      col = col.to_numpy(zero_copy_only=False)
  except ImportError:
    pass
  arr = np.asarray(col)
  if arr.dtype.kind in ('f', 'i', 'u', 'b'):
    return np.nan_to_num(arr.astype(np.float32), nan=default)
  # string -> float with default for empties
  out = np.empty(arr.shape[0], dtype=np.float32)
  for i, v in enumerate(arr):
    try:
      out[i] = float(v) if v not in ('', None) else default
    except (TypeError, ValueError):
      out[i] = default
  return out


def _to_int(col) -> np.ndarray:
  try:
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
      col = col.combine_chunks()
    if isinstance(col, pa.Array):
      if pa.types.is_integer(col.type):
        return col.fill_null(0).to_numpy(zero_copy_only=False).astype(
            np.int64)
      col = col.to_numpy(zero_copy_only=False)
  except ImportError:
    pass
  arr = np.asarray(col)
  if arr.dtype.kind in ('i', 'u'):
    return arr.astype(np.int64)
  if arr.dtype.kind == 'f':
    return np.nan_to_num(arr, nan=0).astype(np.int64)
  out = np.empty(arr.shape[0], dtype=np.int64)
  for i, v in enumerate(arr):
    try:
      out[i] = int(float(v)) if v not in ('', None) else 0
    except (TypeError, ValueError):
      out[i] = 0
  return out


def _lookup_ids(col, config, rows: int) -> np.ndarray:
  """Single-value column -> int ids [B] according to the vocab scheme."""
  if config.hash_bucket_size > 0:
    return hashing.hash_strings(col, int(config.hash_bucket_size))
  if config.num_buckets > 0:
    ids = _to_int(col)
    return np.clip(ids, 0, int(config.num_buckets) - 1)
  if list(config.boundaries):
    # numeric values bucketized by boundaries (sequence sub_feature_type
    # RawFeature + boundaries: reference feature_column sequence
    # bucketized path, dbmtl_on_numeric_boundary_sequence_feature)
    vals = np.zeros(len(col), dtype=np.float64)
    for i, v in enumerate(_to_numpy_str(col)):
      try:
        vals[i] = float(v)
      except ValueError:
        pass
    bounds = np.asarray(config.boundaries, dtype=np.float64)
    return np.searchsorted(bounds, vals, side='right').astype(np.int64)
  if config.vocab_list or config.vocab_file:
    vocab = list(config.vocab_list)
    if not vocab and config.vocab_file:
      with open(config.vocab_file) as f:
        vocab = [line.strip() for line in f if line.strip()]
    import pandas as pd
    mapping = {v: i for i, v in enumerate(vocab)}
    vals = pd.Series(_to_numpy_str(col))
    return vals.map(mapping).fillna(len(vocab)).to_numpy().astype(np.int64)
  raise ValueError('feature %s has no vocab scheme' %
                   (config.feature_name or config.input_names[0]))


class BaseTransform:
  """Transforms one raw column set into packed arrays for one feature."""

  def __init__(self, spec: FeatureSpec):
    self.spec = spec
    self.config = spec.config

  def __call__(self, columns: Dict[str, object]) -> Dict[str, np.ndarray]:
    raise NotImplementedError


class IdTransform(BaseTransform):

  def __call__(self, columns):
    spec, config = self.spec, self.config
    col = columns[config.input_names[0]]
    ids = _lookup_ids(col, config, spec.rows)
    # empty strings carry zero weight (the reference's SparseTensor simply
    # omits them)
    if config.hash_bucket_size > 0 or config.vocab_list or config.vocab_file:
      strs = _to_numpy_str(col)
      weights = (strs != '').astype(np.float32)
    else:
      weights = np.ones(ids.shape[0], dtype=np.float32)
    return {
        spec.ids_key: ids.astype(np.int32)[:, None],
        spec.weights_key: weights[:, None],
    }


def _list_rows(col):
  """Arrow list/large_list/fixed_size_list column -> python rows, else
  None (parquet multi-value columns, reference parquet_input.py packs
  these natively)."""
  try:
    import pyarrow as pa
  except ImportError:
    return None
  if isinstance(col, pa.ChunkedArray):
    col = col.combine_chunks()
  if isinstance(col, pa.Array) and (
      pa.types.is_list(col.type) or pa.types.is_large_list(col.type) or
      pa.types.is_fixed_size_list(col.type)):
    return col.to_pylist()
  return None


def _lists_to_strings(col, sep: str):
  """Join a list column's rows with the feature separator so the
  string-splitting transforms work unchanged; None if not a list col."""
  rows = _list_rows(col)
  if rows is None:
    return None
  out = np.empty(len(rows), dtype=object)
  for i, r in enumerate(rows):
    out[i] = '' if not r else sep.join(str(v) for v in r)
  return out


class TagTransform(BaseTransform):
  """Multi-value tags 'a|b|c', optionally weighted 'a:0.5|b:2'."""

  def __call__(self, columns):
    spec, config = self.spec, self.config
    col = columns[config.input_names[0]]
    sep = config.separator or '|'
    joined = _lists_to_strings(col, sep)
    if joined is not None:
      col = joined
    k = spec.num_ids
    if config.kv_separator:
      strs = _to_numpy_str(col)
      n = strs.shape[0]
      ids = np.zeros((n, k), dtype=np.int64)
      weights = np.zeros((n, k), dtype=np.float32)
      kv = config.kv_separator
      keys_flat, wts_flat, pos = [], [], []
      for i, s in enumerate(strs):
        if not s:
          continue
        j = 0
        for piece in s.split(sep):
          if not piece or j >= k:
            continue
          if kv in piece:
            key, _, wstr = piece.partition(kv)
            try:
              w = float(wstr)
            except ValueError:
              w = 1.0
          else:
            key, w = piece, 1.0
          keys_flat.append(key)
          wts_flat.append(w)
          pos.append((i, j))
          j += 1
      if keys_flat:
        hashed = self._ids_for(np.array(keys_flat, dtype=object))
        for (i, j), h, w in zip(pos, hashed, wts_flat):
          ids[i, j] = h
          weights[i, j] = w
    else:
      if config.hash_bucket_size > 0:
        ids, counts = hashing.split_hash(
            col, sep, int(config.hash_bucket_size), k)
      else:
        # integer / vocab multi-values via python split
        strs = _to_numpy_str(col)
        n = strs.shape[0]
        ids = np.zeros((n, k), dtype=np.int64)
        counts = np.zeros(n, dtype=np.int32)
        flat, pos = [], []
        for i, s in enumerate(strs):
          j = 0
          for piece in (s.split(sep) if s else []):
            if piece and j < k:
              flat.append(piece)
              pos.append((i, j))
              j += 1
          counts[i] = j
        if flat:
          hashed = self._ids_for(np.array(flat, dtype=object))
          for (i, j), h in zip(pos, hashed):
            ids[i, j] = h
      weights = (np.arange(k)[None, :] < counts[:, None]).astype(np.float32)
      # optional second input carries weights 'w1|w2|...'
      if len(config.input_names) > 1:
        wstrs = _to_numpy_str(columns[config.input_names[1]])
        wvals = np.zeros_like(weights)
        for i, s in enumerate(wstrs):
          if not s:
            continue
          for j, piece in enumerate(s.split(sep)[:k]):
            try:
              wvals[i, j] = float(piece)
            except ValueError:
              wvals[i, j] = 1.0
        weights = weights * wvals
    return {
        spec.ids_key: ids.astype(np.int32),
        spec.weights_key: weights,
    }

  def _ids_for(self, values: np.ndarray) -> np.ndarray:
    return _lookup_ids(values, self.config, self.spec.rows)


class RawTransform(BaseTransform):
  """Raw float features: normalize, then bucketize / raw-project / pass."""

  def __init__(self, spec):
    super().__init__(spec)
    self._normalizer = load_by_path(self.config.normalizer_fn) \
        if self.config.normalizer_fn else None

  def _values(self, columns) -> np.ndarray:
    config = self.config
    raw_dim = max(int(config.raw_input_dim), 1)
    col = columns[config.input_names[0]]
    if raw_dim == 1:
      vals = _to_float(col)[:, None]
    elif (_lr := _list_rows(col)) is not None:
      rows = _lr
      vals = np.zeros((len(rows), raw_dim), dtype=np.float32)
      for i, r in enumerate(rows):
        if r:
          m = min(raw_dim, len(r))
          vals[i, :m] = np.asarray(r[:m], dtype=np.float32)
    else:
      strs = _to_numpy_str(col)
      sep = config.separator or '|'
      vals = np.zeros((strs.shape[0], raw_dim), dtype=np.float32)
      for i, s in enumerate(strs):
        if not s:
          continue
        parts = s.split(sep)
        for d in range(min(raw_dim, len(parts))):
          try:
            vals[i, d] = float(parts[d])
          except ValueError:
            pass
    if config.max_val > config.min_val:
      vals = (vals - config.min_val) / (config.max_val - config.min_val)
    elif self._normalizer is not None:
      vals = self._normalizer(vals)
    return vals.astype(np.float32)

  def __call__(self, columns):
    spec, config = self.spec, self.config
    vals = self._values(columns)
    if list(config.boundaries):
      bounds = np.asarray(config.boundaries, dtype=np.float64)
      ids = np.searchsorted(bounds, vals, side='right')
      return {
          spec.ids_key: ids.astype(np.int32),
          spec.weights_key: np.ones_like(vals, dtype=np.float32),
      }
    if spec.kind == 'categorical':
      # raw projection: embed iota ids weighted by the values
      n, d = vals.shape
      ids = np.broadcast_to(np.arange(d, dtype=np.int32), (n, d))
      return {
          spec.ids_key: np.ascontiguousarray(ids),
          spec.weights_key: vals,
      }
    return {spec.dense_key: vals}


class ComboTransform(BaseTransform):
  """Cross of several inputs, hashed into ids.

  With combo_input_seps, each input is split by its own separator and
  the per-row cross product of values is emitted (reference
  input/input.py:378-430 sparse_cross), capped at spec.num_ids."""

  def __call__(self, columns):
    import itertools
    spec, config = self.spec, self.config
    join = config.combo_join_sep or '\x1d'
    cols = [_to_numpy_str(columns[name]) for name in config.input_names]
    n = cols[0].shape[0]
    seps = list(config.combo_input_seps)
    use_vocab = bool(config.num_buckets or config.vocab_list or
                     config.vocab_file)
    if not seps:
      joined = np.empty(n, dtype=object)
      for i in range(n):
        joined[i] = join.join(str(c[i]) for c in cols)
      ids = _lookup_ids(joined, config, spec.rows) if use_vocab else \
          hashing.hash_strings(joined, spec.rows)
      return {
          spec.ids_key: ids.astype(np.int32)[:, None],
          spec.weights_key: np.ones((n, 1), np.float32),
      }
    K = spec.num_ids
    flat, pos = [], []
    counts = np.zeros(n, dtype=np.int32)
    for i in range(n):
      parts = []
      for c, sep in zip(cols, seps + [''] * (len(cols) - len(seps))):
        s = str(c[i])
        parts.append(s.split(sep) if sep and s else [s])
      for j, combo in enumerate(itertools.product(*parts)):
        if j >= K:
          break
        flat.append(join.join(combo))
        pos.append((i, j))
        counts[i] = j + 1
    ids = np.zeros((n, K), dtype=np.int64)
    if flat:
      arr = np.array(flat, dtype=object)
      hashed = _lookup_ids(arr, config, spec.rows) if use_vocab else \
          hashing.hash_strings(arr, spec.rows)
      for (i, j), h in zip(pos, hashed):
        ids[i, j] = h
    weights = (np.arange(K)[None, :] < counts[:, None]).astype(np.float32)
    return {
        spec.ids_key: ids.astype(np.int32),
        spec.weights_key: weights,
    }


class LookupTransform(BaseTransform):
  """inputs = [key_field, kv_map_field] (reference input order,
  input/input.py:941): selects the map values whose key matches, up to
  lookup_max_sel_elem_num of them."""

  def __call__(self, columns):
    spec, config = self.spec, self.config
    keys = _to_numpy_str(columns[config.input_names[0]])
    maps = _to_numpy_str(columns[config.input_names[1]])
    sep = config.separator or '|'
    kv = config.kv_separator or ':'
    n = maps.shape[0]
    n_sel = spec.num_ids if spec.kind == 'categorical' else spec.value_dim
    sel = np.empty((n, n_sel), dtype=object)
    sel.fill('')
    counts = np.zeros(n, dtype=np.int32)
    for i in range(n):
      if not maps[i]:
        continue
      key = keys[i]
      j = 0
      for piece in maps[i].split(sep):
        pk, _, pv = piece.partition(kv)
        if pk == key:
          sel[i, j] = pv
          j += 1
          if j >= n_sel:
            break
      counts[i] = j
    mask = (np.arange(n_sel)[None, :] < counts[:, None]).astype(np.float32)
    if spec.kind == 'dense':
      vals = np.zeros((n, n_sel), dtype=np.float32)
      for i in range(n):
        for j in range(counts[i]):
          try:
            vals[i, j] = float(sel[i, j])
          except ValueError:
            pass
      return {spec.dense_key: vals}
    if list(config.boundaries):
      f = np.zeros((n, n_sel), dtype=np.float64)
      for i in range(n):
        for j in range(counts[i]):
          try:
            f[i, j] = float(sel[i, j])
          except ValueError:
            pass
      bounds = np.asarray(config.boundaries, dtype=np.float64)
      ids = np.searchsorted(bounds, f, side='right')
      return {
          spec.ids_key: ids.astype(np.int32),
          spec.weights_key: mask,
      }
    if not (config.hash_bucket_size > 0 or config.num_buckets > 0 or
            config.vocab_list or config.vocab_file):
      # raw-projection numeric lookup: iota ids weighted by the values
      # (reference feature_column raw-projection trick)
      weights = np.zeros((n, n_sel), dtype=np.float32)
      for i in range(n):
        for j in range(counts[i]):
          try:
            weights[i, j] = float(sel[i, j])
          except ValueError:
            pass
      ids = np.broadcast_to(np.arange(n_sel, dtype=np.int32), (n, n_sel))
      return {
          spec.ids_key: np.ascontiguousarray(ids),
          spec.weights_key: weights,
      }
    flat = sel.ravel()
    if config.hash_bucket_size > 0:
      ids = hashing.hash_strings(flat, int(config.hash_bucket_size))
    else:
      ids = _lookup_ids(flat, config, spec.rows)
    ids = ids.reshape(n, n_sel)
    return {
        spec.ids_key: (ids * (mask > 0)).astype(np.int32),
        spec.weights_key: mask,
    }


class ExprTransform(BaseTransform):
  """Arithmetic expression over input fields -> dense value."""

  def __call__(self, columns):
    spec, config = self.spec, self.config
    variables = {
        name: _to_float(columns[name]) for name in config.input_names
    }
    raw = {name: _to_numpy_str(columns[name])
           for name in config.input_names}
    vals = np.asarray(
        expr_util.evaluate(config.expression, variables, raw),
        dtype=np.float32)
    if vals.ndim == 1:
      vals = vals[:, None]
    if spec.kind == 'categorical':
      n, d = vals.shape
      ids = np.broadcast_to(np.arange(d, dtype=np.int32), (n, d))
      return {
          spec.ids_key: np.ascontiguousarray(ids),
          spec.weights_key: vals,
      }
    return {spec.dense_key: vals}


class SequenceTransform(BaseTransform):
  """Behavior sequences 'i1|i2|...' -> ids[B, L] + mask[B, L]."""

  def __call__(self, columns):
    spec, config = self.spec, self.config
    col = columns[config.input_names[0]]
    sep = config.separator or '|'
    joined = _lists_to_strings(col, sep)
    if joined is not None:
      col = joined
    L = spec.num_ids
    if spec.seq_is_dense:
      # numeric sequence -> [B, L, N]: positions split by `separator`,
      # each position's N sub-values by `seq_multi_sep` (reference
      # input/input.py raw seq parse w/ seq_multi_sep)
      strs = _to_numpy_str(col)
      n = strs.shape[0]
      sub_sep = config.seq_multi_sep or None
      N = spec.value_dim
      vals = np.zeros((n, L, N), dtype=np.float32)
      mask = np.zeros((n, L), dtype=np.float32)
      for i, s in enumerate(strs):
        if not s:
          continue
        parts = s.split(sep)[:L]
        for j, piece in enumerate(parts):
          subs = piece.split(sub_sep) if sub_sep else [piece]
          for k, sub in enumerate(subs[:N]):
            try:
              vals[i, j, k] = float(sub)
            except ValueError:
              pass
          mask[i, j] = 1.0
      return {spec.dense_key: vals, spec.mask_key: mask}
    if config.hash_bucket_size > 0:
      ids, counts = hashing.split_hash(
          col, sep, int(config.hash_bucket_size), L)
    else:
      strs = _to_numpy_str(col)
      n = strs.shape[0]
      ids = np.zeros((n, L), dtype=np.int64)
      counts = np.zeros(n, dtype=np.int32)
      flat, pos = [], []
      for i, s in enumerate(strs):
        j = 0
        for piece in (s.split(sep) if s else []):
          if piece and j < L:
            flat.append(piece)
            pos.append((i, j))
            j += 1
        counts[i] = j
      if flat:
        hashed = _lookup_ids(np.array(flat, dtype=object), config, spec.rows)
        for (i, j), h in zip(pos, hashed):
          ids[i, j] = h
    mask = (np.arange(L)[None, :] < counts[:, None]).astype(np.float32)
    return {
        spec.ids_key: ids.astype(np.int32),
        spec.mask_key: mask,
    }


class PassThroughTransform(BaseTransform):

  def __call__(self, columns):
    spec, config = self.spec, self.config
    vals = _to_float(columns[config.input_names[0]])
    if vals.ndim == 1:
      vals = vals[:, None]
    return {spec.dense_key: vals}


_TRANSFORMS = {
    FeatureType.IdFeature: IdTransform,
    FeatureType.TagFeature: TagTransform,
    FeatureType.RawFeature: RawTransform,
    FeatureType.ComboFeature: ComboTransform,
    FeatureType.LookupFeature: LookupTransform,
    FeatureType.SequenceFeature: SequenceTransform,
    FeatureType.ExprFeature: ExprTransform,
    FeatureType.PassThroughFeature: PassThroughTransform,
}


def build_transform(spec: FeatureSpec) -> BaseTransform:
  cls = _TRANSFORMS.get(spec.config.feature_type)
  if cls is None:
    raise ValueError('no transform for feature type %s' %
                     spec.config.feature_type)
  return cls(spec)


def build_transforms(specs: Dict[str, FeatureSpec]) -> List[BaseTransform]:
  return [build_transform(spec) for spec in specs.values()]


def apply_transforms(transforms: List[BaseTransform],
                     columns: Dict[str, object]) -> Dict[str, np.ndarray]:
  out: Dict[str, np.ndarray] = {}
  for t in transforms:
    out.update(t(columns))
  return out
