"""Parameter bridge: uniform read access over a typed proto message or a
google.protobuf.Struct (free-form json) — the two ways a backbone
KerasLayer block carries its parameters.

Mirrors the role of the reference's easy_rec/python/layers/utils.py
Parameter wrapper (used by backbone.py:350-418 reflection instantiation).
"""

from __future__ import annotations

from typing import Any


def _struct_value(value):
  """Unwrap a google.protobuf.struct_pb2.Value into a python object."""
  kind = value.WhichOneof('kind')
  if kind == 'number_value':
    n = value.number_value
    return int(n) if float(n).is_integer() else n
  if kind == 'string_value':
    return value.string_value
  if kind == 'bool_value':
    return value.bool_value
  if kind == 'list_value':
    return [_struct_value(v) for v in value.list_value.values]
  if kind == 'struct_value':
    return {k: _struct_value(v) for k, v in value.struct_value.fields.items()}
  return None


class Parameter:
  """Read-only view over a pb message ('pb' mode) or Struct ('struct')."""

  def __init__(self, payload: Any, is_struct: bool):
    self._payload = payload
    self._is_struct = is_struct
    if is_struct and payload is not None and hasattr(payload, 'fields'):
      self._dict = {k: _struct_value(v) for k, v in payload.fields.items()}
    elif is_struct and isinstance(payload, dict):
      self._dict = dict(payload)
    else:
      self._dict = None

  @classmethod
  def from_keras_layer(cls, keras_layer_pb) -> 'Parameter':
    """Build from a KerasLayer proto: typed oneof or st_params Struct."""
    which = keras_layer_pb.WhichOneof('params')
    if which is None:
      return cls({}, True)
    payload = getattr(keras_layer_pb, which)
    return cls(payload, which == 'st_params')

  @property
  def is_struct(self) -> bool:
    return self._is_struct

  def has(self, name: str) -> bool:
    if self._is_struct:
      return name in self._dict
    try:
      if self._payload.HasField(name):
        return True
    except ValueError:
      pass  # repeated / non-optional fields don't support HasField
    return any(f.name == name for f in self._payload.DESCRIPTOR.fields)

  def get(self, name: str, default=None):
    if self._is_struct:
      return self._dict.get(name, default)
    fields = {f.name for f in self._payload.DESCRIPTOR.fields}
    if name not in fields:
      return default
    return getattr(self._payload, name)

  def get_list(self, name: str, default=()):
    val = self.get(name, None)
    if val is None:
      return list(default)
    return list(val)

  def get_int(self, name: str, default: int = 0) -> int:
    return int(self.get(name, default) or default)

  def get_float(self, name: str, default: float = 0.0) -> float:
    v = self.get(name, None)
    return float(v) if v is not None else default

  def get_bool(self, name: str, default: bool = False) -> bool:
    v = self.get(name, None)
    return bool(v) if v is not None else default

  def get_str(self, name: str, default: str = '') -> str:
    v = self.get(name, None)
    return str(v) if v else default

  def get_pb(self, name: str):
    """Typed sub-message (pb mode only); None when absent."""
    if self._is_struct:
      sub = self._dict.get(name)
      return Parameter(sub, True) if isinstance(sub, dict) else None
    if self.has(name):
      return getattr(self._payload, name)
    return None

  def __getattr__(self, name: str):
    if name.startswith('_'):
      raise AttributeError(name)
    return self.get(name)
