#!/usr/bin/env bash
# Codec input-compression quality sweep for COCO detection (parity with the
# reference's script/codec_input_compression/coco2017-object_detection.sh).
set -eu

CODEC=${1:-jpeg}
case "${CODEC}" in
  jpeg|webp) QUALITIES=$(seq 10 10 100) ;;
  bpg)       QUALITIES=$(seq 5 5 50) ;;
  *) echo "unknown codec ${CODEC}"; exit 1 ;;
esac

for Q in ${QUALITIES}; do
  echo "=== ${CODEC} quality ${Q} ==="
  python script/task/object_detection.py \
    --config "configs/coco2017/input_compression/${CODEC}-faster_rcnn_resnet50_fpn.yaml" \
    --json "{\"models\": {\"wrapper\": {\"kwargs\": {\"codec_config\": {\"kwargs\": {\"quality\": ${Q}}}}}}}" \
    -test_only
done
