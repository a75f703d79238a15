#!/bin/bash
# MUSDB18 / HRNet training recipe (TPU): per-target magnitude MAE.
# Mirrors reference egs/musdb18/hrnet/train.sh (sr 16k, fft 1024/512,
# criterion mae, adam lr=1e-4).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
target="${target:-vocals}"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir/$target" \
    --model hrnet --target "$target" --criterion mae \
    --sample_rate 16000 --n_fft 1024 --hop_length 512 \
    --batch_size 5 --lr 1e-4 --samples_per_epoch 6400 \
    "$@" | tee -a "$exp_dir/$target/train.log"
