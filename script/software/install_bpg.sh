#!/usr/bin/env bash
# Build BPG (libbpg) encoder/decoder binaries used by the BPG codec baseline
# (reference: script/software/install_bpg.sh builds libbpg-0.9.8).
# Requires network access to fetch the source tarball.
set -eu

VERSION=0.9.8
PREFIX=${PREFIX:-$HOME/.local}
WORK=$(mktemp -d)
trap 'rm -rf "${WORK}"' EXIT

cd "${WORK}"
curl -LO "https://bellard.org/bpg/libbpg-${VERSION}.tar.gz"
tar xzf "libbpg-${VERSION}.tar.gz"
cd "libbpg-${VERSION}"
make -j"$(nproc)"
mkdir -p "${PREFIX}/bin"
cp bpgenc bpgdec "${PREFIX}/bin/"
echo "installed bpgenc/bpgdec to ${PREFIX}/bin (add to PATH)"
