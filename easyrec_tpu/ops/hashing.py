"""Vectorized string -> bucket hashing for categorical features.

Replaces the reference's TF `string_to_hash_bucket_fast` (farmhash). Exact
hash parity with TF is not required (AUC parity only needs a consistent,
well-mixed hash — SURVEY.md §7 "hash-bucket parity"); what matters is that
the same string always lands in the same bucket across train/eval/export.

Backends, fastest first:
  1. native C++ MurmurHash64A batch kernel (easyrec_tpu/ops/native), built
     on demand with g++ and called through ctypes,
  2. pandas.util.hash_array (C siphash implementation).
"""

from __future__ import annotations

import logging
import os
import subprocess

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), 'native')
_LIB_PATH = os.path.join(_SRC_DIR, 'libeasyrec_native.so')


def _load_native():
  """Build (if needed) and load the native hashing library."""
  global _NATIVE, _NATIVE_TRIED
  if _NATIVE_TRIED:
    return _NATIVE
  _NATIVE_TRIED = True
  try:
    src = os.path.join(_SRC_DIR, 'native_ops.cc')
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(src) and
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
      subprocess.check_call(
          ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-march=native',
           src, '-o', _LIB_PATH],
          stderr=subprocess.DEVNULL)
    import ctypes
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hash_strings_mod.restype = None
    lib.hash_strings_mod.argtypes = [
        ctypes.c_char_p,                  # concatenated utf8 bytes
        ctypes.POINTER(ctypes.c_int64),   # offsets [n+1]
        ctypes.c_int64,                   # n
        ctypes.c_uint64,                  # num_buckets
        ctypes.POINTER(ctypes.c_int64),   # out [n]
    ]
    lib.split_hash_strings.restype = None
    lib.split_hash_strings.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,                   # n
        ctypes.c_char,                    # separator byte
        ctypes.c_uint64,                  # num_buckets
        ctypes.c_int64,                   # max_k
        ctypes.c_int64,                   # pad_id
        ctypes.POINTER(ctypes.c_int64),   # ids [n*max_k]
        ctypes.POINTER(ctypes.c_int32),   # counts [n]
    ]
    if hasattr(lib, 'text_normalize_inplace'):
      lib.text_normalize_inplace.restype = None
      lib.text_normalize_inplace.argtypes = [
          ctypes.POINTER(ctypes.c_char), ctypes.c_int64]
      lib.edit_distance_batch.restype = None
      lib.edit_distance_batch.argtypes = [
          ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
          ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
          ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
      lib.term_overlap_batch.restype = None
      lib.term_overlap_batch.argtypes = [
          ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
          ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
          ctypes.c_int64, ctypes.c_char,
          ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
          ctypes.POINTER(ctypes.c_int32)]
    _NATIVE = lib
  except Exception as e:  # pragma: no cover - depends on toolchain
    logging.info('native hash unavailable (%s); using pandas backend', e)
    _NATIVE = None
  return _NATIVE


def hash_strings(values, num_buckets: int) -> np.ndarray:
  """Hash an array of strings into [0, num_buckets) as int64.

  Accepts a numpy array or a pyarrow (chunked) string array. Arrow input
  takes a zero-copy path straight into the native kernel.
  """
  lib = _load_native()
  if lib is not None:
    arrow = _as_arrow(values)
    if arrow is None:
      # numpy/object input: arrow conversion is a fast C pass and keeps the
      # hash function identical across all input paths (train == serve)
      arr = np.asarray(values)
      if arr.dtype.kind not in ('U', 'S', 'O', 'T'):
        arr = arr.astype(str)
      import pyarrow as pa
      arrow = _as_arrow(pa.array(arr.ravel().astype(object), type=pa.string()))
      return _hash_arrow(lib, arrow, num_buckets).reshape(arr.shape)
    return _hash_arrow(lib, arrow, num_buckets)
  values = np.asarray(values)
  if values.dtype.kind not in ('U', 'S', 'O', 'T'):
    values = values.astype(str)
  return _hash_pandas(values, num_buckets)


def split_hash(values, sep: str, num_buckets: int, max_k: int,
               pad_id: int = 0):
  """Split delimited strings and hash each piece: fused native kernel.

  Returns (ids [n, max_k] int64, counts [n] int32). Empty pieces are
  skipped; rows are padded with pad_id. Falls back to a python split.
  """
  lib = _load_native()
  if lib is not None:
    arrow = _as_arrow(values)
    if arrow is not None:
      return _split_hash_arrow(lib, arrow, sep, num_buckets, max_k, pad_id)
  # fallback: python-level split
  values = np.asarray(values)
  n = values.shape[0]
  ids = np.full((n, max_k), pad_id, dtype=np.int64)
  counts = np.zeros(n, dtype=np.int32)
  pieces, rows = [], []
  for i, s in enumerate(values):
    s = s if isinstance(s, str) else ('' if s is None else str(s))
    k = 0
    for piece in s.split(sep):
      if piece and k < max_k:
        pieces.append(piece)
        rows.append((i, k))
        k += 1
    counts[i] = k
  if pieces:
    hashed = hash_strings(np.array(pieces, dtype=object), num_buckets)
    for (i, k), h in zip(rows, hashed):
      ids[i, k] = h
  return ids, counts


def _split_hash_arrow(lib, arr, sep, num_buckets, max_k, pad_id):
  import ctypes
  n = len(arr)
  ids = np.empty((n, max_k), dtype=np.int64)
  counts = np.empty(n, dtype=np.int32)
  if n == 0:
    return ids, counts
  if arr.null_count:
    arr = arr.fill_null('')
  buffers = arr.buffers()
  offsets32 = np.frombuffer(buffers[1], dtype=np.int32,
                            count=n + 1 + arr.offset)[arr.offset:]
  offsets = offsets32.astype(np.int64)
  base = ctypes.cast(buffers[2].address, ctypes.c_char_p)
  lib.split_hash_strings(
      base, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      ctypes.c_int64(n), ctypes.c_char(sep.encode('utf-8')),
      ctypes.c_uint64(num_buckets), ctypes.c_int64(max_k),
      ctypes.c_int64(pad_id),
      ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
  return ids, counts


def _as_arrow(values):
  """Return a flat pyarrow string Array for arrow-ish inputs, else None."""
  try:
    import pyarrow as pa
  except ImportError:  # pragma: no cover
    return None
  if isinstance(values, pa.ChunkedArray):
    values = values.combine_chunks()
  if isinstance(values, pa.Array) and pa.types.is_string(values.type):
    return values
  if isinstance(values, pa.Array) and pa.types.is_large_string(values.type):
    return values.cast(pa.string())
  return None


def _hash_arrow(lib, arr, num_buckets: int) -> np.ndarray:
  """Zero-copy hash of a pyarrow string array via its offsets/data buffers."""
  import ctypes
  import pyarrow as pa
  n = len(arr)
  out = np.empty(n, dtype=np.int64)
  if n == 0:
    return out
  if arr.null_count:
    arr = arr.fill_null('')
  buffers = arr.buffers()  # [validity, offsets(int32), data]
  offsets32 = np.frombuffer(buffers[1], dtype=np.int32,
                            count=n + 1 + arr.offset)[arr.offset:]
  offsets = offsets32.astype(np.int64)
  data_buf = buffers[2]
  base = ctypes.cast(data_buf.address, ctypes.c_char_p)
  lib.hash_strings_mod(
      base, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      ctypes.c_int64(n), ctypes.c_uint64(num_buckets),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
  return out


def _hash_native(lib, values: np.ndarray, num_buckets: int) -> np.ndarray:
  import ctypes
  flat = values.ravel()
  n = flat.shape[0]
  # encode to one contiguous utf-8 buffer + offsets
  enc = [s.encode('utf-8') if isinstance(s, str) else bytes(s) for s in flat]
  offsets = np.zeros(n + 1, dtype=np.int64)
  np.cumsum([len(b) for b in enc], out=offsets[1:])
  buf = b''.join(enc)
  out = np.empty(n, dtype=np.int64)
  lib.hash_strings_mod(
      buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      ctypes.c_int64(n), ctypes.c_uint64(num_buckets),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
  return out.reshape(values.shape)


def _hash_pandas(values: np.ndarray, num_buckets: int) -> np.ndarray:
  import pandas as pd
  flat = values.ravel()
  h = pd.util.hash_array(flat, categorize=False)
  return (h % np.uint64(num_buckets)).astype(np.int64).reshape(values.shape)


def hash_ints(values: np.ndarray, num_buckets: int) -> np.ndarray:
  """Mix and bucket integer ids (splitmix64 finalizer)."""
  x = np.asarray(values).astype(np.uint64)
  x = (x ^ (x >> np.uint64(30))) * np.uint64(0xbf58476d1ce4e5b9)
  x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94d049bb133111eb)
  x = x ^ (x >> np.uint64(31))
  return (x % np.uint64(num_buckets)).astype(np.int64)
