#!/bin/bash
# WHAM! enhancement/separation with Conv-TasNet (TPU).
# The WHAM tasks (enhance-single, enhance-both, separate-noisy; reference
# egs/wham/README.md) reuse the wsj0-style list/dir layout with noise
# mixed in; point the roots at the prepared WHAM wav dirs and set
# --n_sources (1 for enhancement targets + noise, 2 for separate-noisy).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_train="${wav_root_train:?set wav_root_train}"
wav_root_valid="${wav_root_valid:?set wav_root_valid}"
list_train="${list_train:?set list_train}"
list_valid="${list_valid:?set list_valid}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix \
    --model conv-tasnet \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    -N 512 -L 16 -H 512 -B 128 -Sc 128 -P 3 -R 3 -X 8 --enc_nonlinear relu \
    --exp_dir "$exp_dir" \
    "$@" | tee -a "$exp_dir/train.log"
