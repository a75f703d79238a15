#!/bin/bash
# Stage WHAMR! (noisy + reverberant wsj0-2mix). Counterpart of reference
# egs/whamr/common/prepare_whamr.sh: fetch the official creation scripts and
# run them against local WSJ0 + wham_noise. Requires network; in an airgapped
# environment pre-stage the generated tree and skip this script.
set -e
whamr_root="${whamr_root:-../../../dataset/WHAMR}"
wham_noise_root="${wham_noise_root:-../../../dataset/wham_noise}"
wsj0_root="${wsj0_root:-../../../dataset/wsj0_wav}"

if [ ! -d "$wham_noise_root" ]; then
    mkdir -p "$wham_noise_root"
    wget "https://storage.googleapis.com/whisper-public/wham_noise.zip" -P /tmp
    unzip -q /tmp/wham_noise.zip -d "$wham_noise_root" && rm /tmp/wham_noise.zip
fi
if [ ! -e "$whamr_root/whamr_scripts/create_wham_from_scratch.py" ]; then
    mkdir -p "$whamr_root"
    wget "https://storage.googleapis.com/whisper-public/whamr_scripts.tar.gz" -P /tmp
    tar -xzf /tmp/whamr_scripts.tar.gz -C "$whamr_root" && rm /tmp/whamr_scripts.tar.gz
fi
(cd "$whamr_root/whamr_scripts" && python create_wham_from_scratch.py \
    --wsj0-root "$wsj0_root" --wham-noise-root "$wham_noise_root" \
    --output-dir "$whamr_root")
