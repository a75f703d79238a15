#!/bin/bash
# DSD100 / Conv-TasNet training recipe (TPU).
# Counterpart of reference egs/dsd100/conv-tasnet: after
# egs/dsd100/common/prepare_dsd100.sh converts DSD100 to the musdb18
# layout, the musdb18 conv-tasnet CLI drives training directly.
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
dsd100_root="${dsd100_root:-../../../dataset/DSD100}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$dsd100_root" --exp_dir "$exp_dir" \
    --model conv-tasnet --criterion mse \
    -N 256 -L 20 -HH 512 -B 256 -Sc 128 -X 10 -R 4 \
    --duration 8 --batch_size 4 --lr 3e-4 --max_norm 5 \
    "$@" | tee -a "$exp_dir/train.log"
