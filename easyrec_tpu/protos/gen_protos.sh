#!/bin/bash
# Regenerate python protobuf bindings for easyrec_tpu.
# Run from the repo root: bash easyrec_tpu/protos/gen_protos.sh
set -e
cd "$(dirname "$0")/../.."
protoc --python_out=. \
  easyrec_tpu/protos/common.proto \
  easyrec_tpu/protos/example.proto \
  easyrec_tpu/protos/data.proto \
  easyrec_tpu/protos/layers.proto \
  easyrec_tpu/protos/models.proto \
  easyrec_tpu/protos/train.proto \
  easyrec_tpu/protos/pipeline.proto
echo "generated: $(ls easyrec_tpu/protos/*_pb2.py)"
