#!/bin/bash
# Build all native components (C++ PESQ CLI + WAV loader shared library).
set -e
cd "$(dirname "$0")"
make -C pesq
make -C audioio
echo "native build OK: pesq/pesq, audioio/libwavloader.so"
