#!/bin/bash
# wsj0-mix / dptnet evaluation recipe (TPU).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
wav_root_test="${wav_root_test:-../../../dataset/wsj0-mix/2speakers/wav8k/min/tt}"
list_test="${list_test:-../../../dataset/wsj0-mix/2speakers/mix_2_spk_min_tt_mix}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
model_choice="${model_choice:-best}"

python -m dnn_based_source_separation_tpu.cli.test_wsj0mix \
    --test_wav_root "$wav_root_test" --test_list_path "$list_test" \
    --model_path "$exp_dir/model/$model_choice.ckpt" \
    --out_dir "$exp_dir/test" \
    "$@" | tee -a "$exp_dir/test.log"
