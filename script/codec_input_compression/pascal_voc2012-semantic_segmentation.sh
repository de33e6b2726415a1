#!/usr/bin/env bash
# Codec input-compression quality sweep for PASCAL VOC segmentation (parity
# with the reference's pascal_voc2012-semantic_segmentation.sh).
set -eu

CODEC=${1:-jpeg}
BACKBONE=${2:-resnet50}
case "${CODEC}" in
  jpeg|webp) QUALITIES=$(seq 10 10 100) ;;
  bpg)       QUALITIES=$(seq 5 5 50) ;;
  *) echo "unknown codec ${CODEC}"; exit 1 ;;
esac

for Q in ${QUALITIES}; do
  echo "=== ${CODEC} quality ${Q} (deeplabv3_${BACKBONE}) ==="
  python script/task/semantic_segmentation.py \
    --config "configs/pascal_voc2012/input_compression/${CODEC}-deeplabv3_${BACKBONE}.yaml" \
    --json "{\"models\": {\"wrapper\": {\"kwargs\": {\"codec_encoder_decoder\": {\"kwargs\": {\"quality\": ${Q}}}}}}}" \
    -test_only
done
