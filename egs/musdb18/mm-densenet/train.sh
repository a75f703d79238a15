#!/bin/bash
# MUSDB18 / MMDenseNet training recipe (TPU): per-stem band-split DenseNets,
# magnitude MSE. Mirrors reference egs/musdb18/mm-densenet/train.sh.
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
config="${config:-./config/paper.yaml}"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir" \
    --model mm-densenet --mmdense_config "$config" \
    --n_fft 2048 --hop_length 1024 \
    --batch_size 6 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
