"""TFRecord reading/writing without a TensorFlow dependency.

Wire format (tensorflow/core/lib/io/record_writer.h):
  uint64 length | uint32 masked_crc32(length) | bytes data |
  uint32 masked_crc32(data)

The CRCs are CRC32-C (Castagnoli) with TF's rotation mask. Readers accept
files written by TF / the reference pipeline (TFRecordInput,
easy_rec/python/input/tfrecord_input.py); the writer produces files TF
can read back (used by tests and tools).
"""

from __future__ import annotations

import struct
from typing import Iterator

_MASK_DELTA = 0xa282ead8

_CRC_TABLE = []
_POLY = 0x82F63B78  # CRC32-C reversed polynomial
for _i in range(256):
  _c = _i
  for _ in range(8):
    _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
  _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
  crc = 0xFFFFFFFF
  for b in data:
    crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
  return crc ^ 0xFFFFFFFF


try:  # zlib's crc32 is not castagnoli; google-crc32c may not exist —
  # fall back to the pure-python table version above
  import crc32c as _crc32c_mod

  def _crc32c(data: bytes) -> int:  # noqa: F811
    return _crc32c_mod.crc32c(data)
except ImportError:
  pass


def _masked_crc(data: bytes) -> int:
  crc = _crc32c(data)
  return ((((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF)


def read_records(path: str, verify_crc: bool = False,
                 compression: str = '') -> Iterator[bytes]:
  """Yield raw record payloads from a TFRecord file. GZIP handled via
  data_config.data_compression_type or a .gz suffix."""
  import gzip
  opener = gzip.open if (compression.upper() == 'GZIP' or
                         path.endswith('.gz')) else open
  with opener(path, 'rb') as f:
    while True:
      header = f.read(12)
      if len(header) < 12:
        return
      length, len_crc = struct.unpack('<QI', header)
      if verify_crc and _masked_crc(header[:8]) != len_crc:
        raise IOError('corrupt TFRecord length crc in %s' % path)
      data = f.read(length)
      crc = f.read(4)
      if len(data) < length or len(crc) < 4:
        return  # truncated tail
      if verify_crc and _masked_crc(data) != struct.unpack('<I', crc)[0]:
        raise IOError('corrupt TFRecord data crc in %s' % path)
      yield data


def write_records(path: str, payloads) -> int:
  """Write raw payloads as a TFRecord file; returns record count."""
  n = 0
  with open(path, 'wb') as f:
    for data in payloads:
      header = struct.pack('<Q', len(data))
      f.write(header)
      f.write(struct.pack('<I', _masked_crc(header)))
      f.write(data)
      f.write(struct.pack('<I', _masked_crc(data)))
      n += 1
  return n


def example_to_columns(payloads, field_names, field_types):
  """Parse tf.Example payloads into {name: list} columns."""
  import numpy as np

  from easyrec_tpu.protos import example_pb2

  cols = {name: [] for name in field_names}
  for payload in payloads:
    ex = example_pb2.Example()
    ex.ParseFromString(payload)
    fmap = ex.features.feature
    for name in field_names:
      feat = fmap.get(name)
      if feat is None:
        cols[name].append('')
        continue
      kind = feat.WhichOneof('kind')
      if kind == 'bytes_list':
        vals = [v.decode('utf-8', 'replace') for v in feat.bytes_list.value]
        cols[name].append(vals[0] if len(vals) == 1 else '|'.join(vals))
      elif kind == 'float_list':
        vals = list(feat.float_list.value)
        cols[name].append(vals[0] if len(vals) == 1 else vals)
      elif kind == 'int64_list':
        vals = list(feat.int64_list.value)
        cols[name].append(vals[0] if len(vals) == 1 else vals)
      else:
        cols[name].append('')
  return cols


def columns_to_example(row: dict) -> bytes:
  """{name: scalar|list|str} -> serialized tf.Example."""
  from easyrec_tpu.protos import example_pb2
  ex = example_pb2.Example()
  for name, value in row.items():
    feat = ex.features.feature[name]
    if isinstance(value, str):
      feat.bytes_list.value.append(value.encode())
    elif isinstance(value, bytes):
      feat.bytes_list.value.append(value)
    elif isinstance(value, (list, tuple)):
      if value and isinstance(value[0], str):
        feat.bytes_list.value.extend(v.encode() for v in value)
      elif value and isinstance(value[0], float):
        feat.float_list.value.extend(value)
      else:
        feat.int64_list.value.extend(int(v) for v in value)
    elif isinstance(value, float):
      feat.float_list.value.append(value)
    else:
      feat.int64_list.value.append(int(value))
  return ex.SerializeToString()
