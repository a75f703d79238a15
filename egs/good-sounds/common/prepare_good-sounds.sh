#!/bin/bash
# Stage good-sounds. Counterpart of reference
# egs/good-sounds/common/prepare_good-sounds.sh (zenodo record 4588740).
set -e
gs_root="${gs_root:-../../../dataset/good-sounds}"
if [ ! -d "$gs_root/good-sounds" ]; then
    mkdir -p "$gs_root"
    wget "https://zenodo.org/record/4588740/files/good-sounds.zip" -P /tmp
    unzip -q /tmp/good-sounds.zip -d "$gs_root" && rm /tmp/good-sounds.zip
fi
