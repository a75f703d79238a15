#!/bin/bash
# Stage LibriMix via the official generation scripts, then point the
# wsj0-mix recipe CLIs at it: Libri2Mix's wav8k/min tree has the same
# mix/s1/s2 layout the `data.wsj0mix` datasets consume (see
# egs/librimix/README.md for the train.sh override variables).
set -e
librimix_root="${librimix_root:-../../../dataset/LibriMix}"
storage_dir="${storage_dir:-$librimix_root}"
if [ ! -d "$librimix_root/LibriMix" ]; then
    mkdir -p "$librimix_root"
    git clone https://github.com/JorisCos/LibriMix "$librimix_root/LibriMix"
fi
(cd "$librimix_root/LibriMix" && ./generate_librimix.sh "$storage_dir")
