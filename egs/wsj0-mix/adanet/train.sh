#!/bin/bash
# wsj0-mix / ADANet training recipe (TPU).
# Mirrors the reference recipe flags (egs/wsj0-mix/adanet/train.sh: wfm
# threshold 40, K=20, H=300, B=4, N=6 anchors, dropout 0.5, adam lr=1e-3).

. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_train="${wav_root_train:-../../../dataset/wsj0-mix/2speakers/wav8k/min/tr}"
wav_root_valid="${wav_root_valid:-../../../dataset/wsj0-mix/2speakers/wav8k/min/cv}"
list_train="${list_train:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_tr_mix}"
list_valid="${list_valid:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_cv_mix}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix_spec \
    --model adanet \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    --exp_dir "$exp_dir" \
    --n_fft 256 --hop_length 64 --ideal_mask wfm --threshold 40 \
    -K 20 -H 300 -B 4 -N 6 --dropout 0.5 --duration 0.8 \
    --criterion se --optimizer adam --lr 1e-3 --batch_size 64 --epochs 150 \
    "$@" | tee -a "$exp_dir/train.log"
