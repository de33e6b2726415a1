#!/usr/bin/env bash
# Neural input-compression quality sweep (parity with the reference's
# script/neural_input_compression/ilsvrc2012-image_classification.sh).
set -eu

FAMILY=${1:-factorized_prior}
for Q in 1 2 3 4 5 6 7 8; do
  echo "=== ${FAMILY} quality ${Q} ==="
  python script/task/image_classification.py \
    --config "configs/ilsvrc2012/input_compression/${FAMILY}-q${Q}-resnet50.yaml" \
    -test_only
done
