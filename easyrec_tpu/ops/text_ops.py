"""Host-side text feature ops (C++-accelerated with numpy fallbacks).

TPU-era equivalents of the reference's prebuilt libcustom_ops.so
(layers/keras/custom_ops.py: text_normalize_op, my_edit_distance,
overlap_fg_op, mapped_dot_product): strings never reach the TPU, so
these run in the host feature pipeline — usable from the ExprFeature DSL
(utils/expr.py string functions) or as Field.user_define_fn.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from easyrec_tpu.ops import hashing


def _offsets(col: np.ndarray) -> Tuple[bytes, np.ndarray]:
  """object string array -> (utf8 buffer, int64 offsets [n+1])."""
  parts = [str(v).encode('utf-8', 'replace') if v is not None else b''
           for v in col]
  offsets = np.zeros(len(parts) + 1, np.int64)
  np.cumsum([len(p) for p in parts], out=offsets[1:])
  return b''.join(parts), offsets


def _lib():
  return hashing._load_native()


def text_normalize(col) -> np.ndarray:
  """Lowercase + punctuation->space (ASCII; multibyte passes through)."""
  col = np.asarray(col, dtype=object)
  lib = _lib()
  if lib is not None and hasattr(lib, 'text_normalize_inplace'):
    import ctypes
    buf, offsets = _offsets(col)
    arr = bytearray(buf)
    c_buf = (ctypes.c_char * len(arr)).from_buffer(arr)
    lib.text_normalize_inplace(c_buf, ctypes.c_int64(len(arr)))
    data = bytes(arr)
    return np.asarray(
        [data[offsets[i]:offsets[i + 1]].decode('utf-8', 'replace')
         for i in range(len(col))], dtype=object)
  # numpy/python fallback
  out = []
  for v in col:
    s = str(v).lower()
    out.append(''.join(c if (c.isalnum() or ord(c) > 127) else ' '
                       for c in s))
  return np.asarray(out, dtype=object)


def edit_distance(col_a, col_b) -> np.ndarray:
  """Per-row Levenshtein distance (int32)."""
  col_a = np.asarray(col_a, dtype=object)
  col_b = np.asarray(col_b, dtype=object)
  lib = _lib()
  if lib is not None and hasattr(lib, 'edit_distance_batch'):
    import ctypes
    buf_a, off_a = _offsets(col_a)
    buf_b, off_b = _offsets(col_b)
    out = np.zeros(len(col_a), np.int32)
    lib.edit_distance_batch(
        buf_a, off_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        buf_b, off_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(col_a)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
  out = np.zeros(len(col_a), np.int32)
  for i, (a, b) in enumerate(zip(col_a, col_b)):
    a, b = str(a)[:256], str(b)[:256]
    dp = list(range(len(b) + 1))
    for ia in range(1, len(a) + 1):
      prev, dp[0] = dp[0], ia
      for jb in range(1, len(b) + 1):
        cur = dp[jb]
        dp[jb] = min(prev + (a[ia - 1] != b[jb - 1]), dp[jb] + 1,
                     dp[jb - 1] + 1)
        prev = cur
    out[i] = dp[len(b)]
  return out


def _overlap_counts(col_a, col_b, sep: str = ' '):
  col_a = np.asarray(col_a, dtype=object)
  col_b = np.asarray(col_b, dtype=object)
  lib = _lib()
  if lib is not None and hasattr(lib, 'term_overlap_batch'):
    import ctypes
    buf_a, off_a = _offsets(col_a)
    buf_b, off_b = _offsets(col_b)
    n = len(col_a)
    common = np.zeros(n, np.int32)
    na = np.zeros(n, np.int32)
    nb = np.zeros(n, np.int32)
    lib.term_overlap_batch(
        buf_a, off_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        buf_b, off_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_char(sep.encode()),
        common.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        na.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return common, na, nb
  common = np.zeros(len(col_a), np.int32)
  na = np.zeros(len(col_a), np.int32)
  nb = np.zeros(len(col_a), np.int32)
  for i, (a, b) in enumerate(zip(col_a, col_b)):
    ta = [t for t in str(a).split(sep) if t]
    tb = [t for t in str(b).split(sep) if t]
    sa = set(ta)
    common[i] = sum(1 for t in tb if t in sa)
    na[i], nb[i] = len(ta), len(tb)
  return common, na, nb


def query_common_ratio(col_a, col_b, sep: str = ' ') -> np.ndarray:
  """common terms / |a| (reference overlap method 'query_common_ratio')."""
  common, na, _ = _overlap_counts(col_a, col_b, sep)
  return (common / np.maximum(na, 1)).astype(np.float32)


def title_common_ratio(col_a, col_b, sep: str = ' ') -> np.ndarray:
  common, _, nb = _overlap_counts(col_a, col_b, sep)
  return (common / np.maximum(nb, 1)).astype(np.float32)


def is_contain(col_a, col_b, sep: str = ' ') -> np.ndarray:
  """1.0 when every term of a appears in b."""
  common, na, _ = _overlap_counts(col_a, col_b, sep)
  return (common >= na).astype(np.float32)


def common_word(col_a, col_b, sep: str = ' ') -> np.ndarray:
  common, _, _ = _overlap_counts(col_a, col_b, sep)
  return common.astype(np.float32)


def mapped_dot_product(map_col, key_col, kv_sep: str = ':',
                       item_sep: str = ',') -> np.ndarray:
  """Sum of values in `map_col` (k:v list) whose keys appear in `key_col`
  (reference mapped_dot_product custom op)."""
  map_col = np.asarray(map_col, dtype=object)
  key_col = np.asarray(key_col, dtype=object)
  out = np.zeros(len(map_col), np.float32)
  for i, (m, k) in enumerate(zip(map_col, key_col)):
    kv = {}
    for item in str(m).split(item_sep):
      if kv_sep in item:
        key, val = item.split(kv_sep, 1)
        try:
          kv[key] = float(val)
        except ValueError:
          pass
    total = 0.0
    for key in str(k).split(item_sep):
      total += kv.get(key, 0.0)
    out[i] = total
  return out
