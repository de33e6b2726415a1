#!/usr/bin/env bash
# Neural input-compression quality sweep for COCO detection (parity with the
# reference's script/neural_input_compression/coco2017-object_detection.sh).
set -eu

FAMILY=${1:-factorized_prior}

for Q in $(seq 1 8); do
  echo "=== ${FAMILY} quality ${Q} ==="
  python script/task/object_detection.py \
    --config "configs/coco2017/input_compression/${FAMILY}-faster_rcnn_resnet50_fpn.yaml" \
    --json "{\"models\": {\"wrapper\": {\"compression_model\": {\"kwargs\": {\"quality\": ${Q}}, \"ckpt\": \"./resource/ckpt/codec/${FAMILY}-q${Q}.ckpt\"}}}}" \
    -test_only
done
