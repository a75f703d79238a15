#!/bin/bash
# MUSDB18 / MRX evaluation recipe (TPU).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
model_choice="${model_choice:-best}"

python -m dnn_based_source_separation_tpu.cli.test_musdb18 \
    --musdb18_root "$musdb18_root" \
    --model_path "$exp_dir/model/$model_choice.ckpt" \
    --out_dir "$exp_dir/test" \
    "$@" | tee -a "$exp_dir/test.log"
