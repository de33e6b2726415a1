#!/usr/bin/env bash
# Neural input-compression quality sweep for PASCAL VOC segmentation (parity
# with the reference's pascal_voc2012-semantic_segmentation.sh).
set -eu

FAMILY=${1:-factorized_prior}
BACKBONE=${2:-resnet50}

for Q in $(seq 1 8); do
  echo "=== ${FAMILY} quality ${Q} (deeplabv3_${BACKBONE}) ==="
  python script/task/semantic_segmentation.py \
    --config "configs/pascal_voc2012/input_compression/${FAMILY}-deeplabv3_${BACKBONE}.yaml" \
    --json "{\"models\": {\"wrapper\": {\"compression_model\": {\"kwargs\": {\"quality\": ${Q}}, \"ckpt\": \"./resource/ckpt/codec/${FAMILY}-q${Q}.ckpt\"}}}}" \
    -test_only
done
