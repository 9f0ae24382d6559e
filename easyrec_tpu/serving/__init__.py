"""Online serving: HTTP model server + client.

The reference serves exported models through the external C++ "EasyRec
Processor" on Aliyun EAS (easy_rec/python/inference/processor/test.py
downloads its .so; the framework only supplies the export + incremental
updates). Here the processor equivalent ships IN the framework: a
threaded HTTP server around `export.predictor.Predictor` that applies
the same incremental-update channels (fs dir / kafka topic) while
serving.
"""

from easyrec_tpu.serving.client import PredictClient  # noqa: F401
from easyrec_tpu.serving.server import PredictorService  # noqa: F401
