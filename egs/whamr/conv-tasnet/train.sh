#!/bin/bash
# WHAMR! / Conv-TasNet training recipe (TPU): the WHAMR tree exposes the same
# mix/s1/s2 layout as wsj0-mix (mix_both_reverb etc.); pick the condition via
# the directory variables.
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
condition="${condition:-mix_both_reverb}"
wav_root_train="${wav_root_train:-../../../dataset/WHAMR/wav8k/min/tr}"
wav_root_valid="${wav_root_valid:-../../../dataset/WHAMR/wav8k/min/cv}"
list_train="${list_train:-../../../dataset/WHAMR/wav8k/min/tr.lst}"
list_valid="${list_valid:-../../../dataset/WHAMR/wav8k/min/cv.lst}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
    --model conv-tasnet \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    --exp_dir "$exp_dir" \
    -N 512 -L 16 -H 512 -B 128 -Sc 128 -P 3 -R 3 -X 8 --enc_nonlinear relu \
    --batch_size 4 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
