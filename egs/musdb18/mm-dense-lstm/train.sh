#!/bin/bash
# MUSDB18 / MMDenseLSTM training recipe (TPU): per-stem band-split
# Dense+LSTM backbones, magnitude MSE. Mirrors reference
# egs/musdb18/mm-dense-lstm/train.sh (fft 4096/2048).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
config="${config:-./config/paper.yaml}"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir" \
    --model mm-dense-lstm --mmdense_config "$config" \
    --n_fft 4096 --hop_length 2048 \
    --batch_size 6 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
