#!/bin/bash
# MUSDB18 / Conv-TasNet training recipe (TPU): joint stereo encoder,
# waveform MSE. Mirrors reference egs/musdb18/conv-tasnet/train.sh
# (N=256 L=20 H=512 B=256 Sc=128 P=3 X=10 R=4, adam lr=3e-4).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir" \
    --model conv-tasnet --criterion mse \
    -N 256 -L 20 -HH 512 -B 256 -Sc 128 -X 10 -R 4 \
    --duration 8 --batch_size 4 --lr 3e-4 --max_norm 5 \
    "$@" | tee -a "$exp_dir/train.log"
