#!/bin/bash
# Build the native PESQ CLI (counterpart of the reference's
# egs/common/prepare_pesq.sh, which downloads + gcc-compiles the ITU-T
# P.862 sources; this container has zero egress, so the in-tree
# P.862-inspired C++ implementation under native/pesq is built instead).
set -e
here="$(cd "$(dirname "$0")" && pwd)"
make -C "$here/../../native/pesq"
ln -sf "$here/../../native/pesq/pesq" "$here/PESQ"
echo "PESQ binary: $here/PESQ"
