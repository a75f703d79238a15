#!/bin/bash
# LibriMix / Conv-TasNet training recipe (TPU): Libri2Mix wav8k/min exposes
# the same mix/s1/s2 layout as wsj0-mix, so the wsj0mix CLI drives it
# directly (see egs/librimix/common/prepare_librimix.sh).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
libri_root="${libri_root:-../../../dataset/LibriMix/Libri2Mix/wav8k/min}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
    --model conv-tasnet \
    --train_wav_root "$libri_root/train-360" --train_list_path "${list_train:-$libri_root/train-360.lst}" \
    --valid_wav_root "$libri_root/dev" --valid_list_path "${list_valid:-$libri_root/dev.lst}" \
    --exp_dir "$exp_dir" \
    -N 512 -L 16 -H 512 -B 128 -Sc 128 -P 3 -R 3 -X 8 --enc_nonlinear relu \
    --batch_size 4 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
