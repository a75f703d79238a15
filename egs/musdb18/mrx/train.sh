#!/bin/bash
# MUSDB18 / MRX training recipe (TPU): multi-resolution crossnet, SI-SDR.
# Mirrors reference egs/musdb18/mrx/train.sh (sisdr, adam lr=1e-3).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir" \
    --model mrx --mrx_n_fft 512,1024,2048 --hop_length 256 \
    --hidden_channels 512 --num_layers 3 \
    --duration 6 --batch_size 16 --lr 1e-3 --samples_per_epoch 6400 \
    "$@" | tee -a "$exp_dir/train.log"
