#!/bin/bash
# LibriMix / Conv-TasNet evaluation recipe (TPU).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
libri_root="${libri_root:-../../../dataset/LibriMix/Libri2Mix/wav8k/min}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
model_choice="${model_choice:-best}"

python -m dnn_based_source_separation_tpu.cli.test_wsj0mix \
    --test_wav_root "$libri_root/test" --test_list_path "${list_test:-$libri_root/test.lst}" \
    --model_path "$exp_dir/model/$model_choice.ckpt" \
    --out_dir "$exp_dir/test" \
    "$@" | tee -a "$exp_dir/test.log"
