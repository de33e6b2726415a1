#!/usr/bin/env bash
# Build VTM (VVC test model) EncoderApp/DecoderApp used by the VTM codec
# baseline (reference: script/software/install_vtm.sh).
# Requires network access to clone the VTM repository.
set -eu

TAG=${VTM_TAG:-VTM-12.0}
PREFIX=${PREFIX:-$HOME/.local}
WORK=$(mktemp -d)
trap 'rm -rf "${WORK}"' EXIT

cd "${WORK}"
git clone --depth 1 --branch "${TAG}" \
  https://vcgit.hhi.fraunhofer.de/jvet/VVCSoftware_VTM.git
cd VVCSoftware_VTM
mkdir build && cd build
cmake .. -DCMAKE_BUILD_TYPE=Release
make -j"$(nproc)" EncoderApp DecoderApp
mkdir -p "${PREFIX}/bin"
cp bin/EncoderApp bin/DecoderApp "${PREFIX}/bin/"
echo "installed EncoderApp/DecoderApp to ${PREFIX}/bin (add to PATH)"
