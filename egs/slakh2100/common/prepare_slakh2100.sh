#!/bin/bash
# Stage Slakh2100 (synthesized multi-track audio). Counterpart of reference
# egs/slakh2100/common/prepare_slakh2100.sh (zenodo records 4599666/4603870).
set -e
slakh_root="${slakh_root:-../../../dataset/slakh2100}"
mkdir -p "$slakh_root"
if [ ! -d "$slakh_root/slakh2100_flac_redux" ]; then
    wget "https://zenodo.org/record/4599666/files/slakh2100_flac_redux.tar.gz" -P /tmp
    tar -zxf /tmp/slakh2100_flac_redux.tar.gz -C "$slakh_root" && rm /tmp/slakh2100_flac_redux.tar.gz
fi
# baby_slakh for quick experiments
if [ ! -d "$slakh_root/babyslakh_16k" ]; then
    wget "https://zenodo.org/record/4603870/files/babyslakh_16k.tar.gz" -P /tmp
    tar -zxf /tmp/babyslakh_16k.tar.gz -C "$slakh_root" && rm /tmp/babyslakh_16k.tar.gz
fi
