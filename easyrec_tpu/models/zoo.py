"""Imports every model family so registry entries are populated."""

from easyrec_tpu.models import rank  # noqa: F401

try:
  from easyrec_tpu.models import match  # noqa: F401
except ImportError:  # pragma: no cover
  pass
try:
  from easyrec_tpu.models import multi_task  # noqa: F401
except ImportError:  # pragma: no cover
  pass
try:
  from easyrec_tpu.models import backbone_model  # noqa: F401
except ImportError:  # pragma: no cover
  pass
try:
  from easyrec_tpu.models import rank_extra  # noqa: F401
except ImportError:  # pragma: no cover
  pass
try:
  from easyrec_tpu.models import match_extra  # noqa: F401
except ImportError:  # pragma: no cover
  pass
