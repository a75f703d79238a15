#!/bin/bash
# WHAM! / LSTM-TasNet training recipe (TPU).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_train="${wav_root_train:-../../../dataset/wham/wav8k/min/tr}"
wav_root_valid="${wav_root_valid:-../../../dataset/wham/wav8k/min/cv}"
list_train="${list_train:-../../../dataset/wham/wav8k/min/tr.lst}"
list_valid="${list_valid:-../../../dataset/wham/wav8k/min/cv.lst}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
    --model lstm-tasnet \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    --exp_dir "$exp_dir" \
    -N 500 -L 40 -H 500 -R 2 --enc_basis trainableGated \
    --batch_size 4 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
