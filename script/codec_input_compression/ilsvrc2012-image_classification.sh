#!/usr/bin/env bash
# Codec input-compression quality sweep (parity with the reference's
# script/codec_input_compression/ilsvrc2012-image_classification.sh, which
# sed-rewrites quality; here the --json override does it non-destructively).
set -eu

CODEC=${1:-jpeg}
case "${CODEC}" in
  jpeg|webp) QUALITIES=$(seq 10 10 100) ;;
  bpg)       QUALITIES=$(seq 5 5 50) ;;
  vtm)       QUALITIES=$(seq 12 5 47) ;;
  *) echo "unknown codec ${CODEC}"; exit 1 ;;
esac

for Q in ${QUALITIES}; do
  echo "=== ${CODEC} quality ${Q} ==="
  python script/task/image_classification.py \
    --config "configs/ilsvrc2012/input_compression/${CODEC}-resnet50.yaml" \
    --json "{\"models\": {\"wrapper\": {\"kwargs\": {\"codec_encoder_decoder\": {\"kwargs\": {\"quality\": ${Q}}}}}}}" \
    -test_only
done
