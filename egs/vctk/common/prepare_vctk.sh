#!/bin/bash
# Stage VCTK. Counterpart of reference egs/vctk/common/prepare_vctk.sh.
set -e
vctk_root="${vctk_root:-../../../dataset/VCTK}"
if [ ! -d "$vctk_root" ]; then
    mkdir -p "$vctk_root"
    wget "http://www.udialogue.org/download/VCTK-Corpus.tar.gz" -P /tmp
    tar -xzf /tmp/VCTK-Corpus.tar.gz -C /tmp && rm /tmp/VCTK-Corpus.tar.gz
    mv /tmp/VCTK-Corpus/* "$vctk_root"
fi
