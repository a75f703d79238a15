#!/bin/bash
# wsj0-mix / deep-clustering training recipe (TPU).
# Mirrors the reference recipe flags (egs/wsj0-mix/deep-clustering/train.sh:
# ibm threshold 40, K=40 embed, H=300, B=2, affinity loss,
# momentum-sgd lr=1e-5 momentum=0.9).

. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_train="${wav_root_train:-../../../dataset/wsj0-mix/2speakers/wav8k/min/tr}"
wav_root_valid="${wav_root_valid:-../../../dataset/wsj0-mix/2speakers/wav8k/min/cv}"
list_train="${list_train:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_tr_mix}"
list_valid="${list_valid:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_cv_mix}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_wsj0mix_spec \
    --model deep-clustering \
    --train_wav_root "$wav_root_train" --train_list_path "$list_train" \
    --valid_wav_root "$wav_root_valid" --valid_list_path "$list_valid" \
    --exp_dir "$exp_dir" \
    --n_fft 256 --hop_length 64 --ideal_mask ibm --threshold 40 \
    -K 40 -H 300 -B 2 --duration 0.8 \
    --criterion affinity --optimizer momentum-sgd --lr 1e-5 --momentum 0.9 \
    --batch_size 64 --epochs 100 \
    "$@" | tee -a "$exp_dir/train.log"
