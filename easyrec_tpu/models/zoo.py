"""Imports every model family so registry entries are populated.

Imports are NOT wrapped in try/except: a broken transitive import must
fail loudly at import time, not surface later as a confusing
"unknown model_class" registry miss (tests/test_models_zoo.py asserts
registry completeness against the expected name list).
"""

from easyrec_tpu.models import backbone_model  # noqa: F401
from easyrec_tpu.models import match  # noqa: F401
from easyrec_tpu.models import match_extra  # noqa: F401
from easyrec_tpu.models import multi_task  # noqa: F401
from easyrec_tpu.models import rank  # noqa: F401
from easyrec_tpu.models import rank_extra  # noqa: F401
