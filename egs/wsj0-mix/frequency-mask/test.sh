#!/bin/bash
# wsj0-mix / oracle frequency-mask evaluation recipe (TPU).
# Mirrors the reference recipe (egs/wsj0-mix/frequency-mask/test.sh): no
# training; evaluates ideal masks (IBM/IRM/WFM/IAM/PSM/ICM) on the test set.
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_test="${wav_root_test:-../../../dataset/wsj0-mix/2speakers/wav8k/min/tt}"
list_test="${list_test:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_tt_mix}"
mask="${mask:-ibm}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.test_oracle_masks \
    --test_wav_root "$wav_root_test" --test_list_path "$list_test" \
    --mask "$mask" --n_fft 256 --hop_length 64 \
    "$@" | tee -a "$exp_dir/test_${mask}.log"
