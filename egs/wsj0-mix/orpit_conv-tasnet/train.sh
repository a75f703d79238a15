#!/bin/bash
# wsj0-mix / ORPIT Conv-TasNet training recipe (TPU): one-and-rest PIT over
# variable source counts (2+3 speakers).
# Mirrors the reference recipe (egs/wsj0-mix/orpit_conv-tasnet/train.sh).

. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_train="${wav_root_train:-../../../dataset/wsj0-mix/2+3speakers/wav8k/min/tr}"
wav_root_valid="${wav_root_valid:-../../../dataset/wsj0-mix/2+3speakers/wav8k/min/cv}"
list_train="${list_train:-../../../dataset/wsj0-mix/2+3speakers/mix_2+3_spk_min_tr_mix}"
list_valid="${list_valid:-../../../dataset/wsj0-mix/2+3speakers/mix_2+3_spk_min_cv_mix}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
    --model conv-tasnet --criterion orpit \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    --exp_dir "$exp_dir" \
    -N 512 -L 16 -H 512 -B 128 -Sc 128 -P 3 -R 3 -X 8 --enc_nonlinear relu \
    --n_sources 2 --batch_size 4 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
