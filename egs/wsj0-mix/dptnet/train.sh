#!/bin/bash
# wsj0-mix / dptnet training recipe (TPU).
# Mirrors the reference recipe flags (egs/wsj0-mix/dptnet/train.sh); extra
# flags pass straight through to the CLI (Kaldi-style --flag value).

. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_train="${wav_root_train:-../../../dataset/wsj0-mix/2speakers/wav8k/min/tr}"
wav_root_valid="${wav_root_valid:-../../../dataset/wsj0-mix/2speakers/wav8k/min/cv}"
list_train="${list_train:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_tr_mix}"
list_valid="${list_valid:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_cv_mix}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
    --model dptnet \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    --exp_dir "$exp_dir" \
    -N 64 -L 2 -K 100 --sep_num_blocks 6 --sep_num_heads 4 --sep_bottleneck_channels 64 --sep_hidden_channels 256 --mask_nonlinear relu --batch_size 2 --warmup_steps 4000 --k1 2e-1 --k2 4e-4 \
    "$@" | tee -a "$exp_dir/train.log"
