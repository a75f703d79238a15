#!/bin/bash
# Separation demo (counterpart of the reference's pyaudio mic demo,
# egs/wsj0-mix/conv-tasnet/demo.sh + local/demo.py — redesigned file-based:
# feed any WAV, get per-source estimates).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
input="${input:?set input=<mixture.wav>}"
exp_dir="${exp_dir:-./exp}"
model_choice="${model_choice:-best}"
out_dir="${out_dir:-./demo_out}"

python -m dnn_based_source_separation_tpu.cli.separate \
    --model_path "$exp_dir/model/$model_choice.ckpt" \
    --input "$input" --out_dir "$out_dir" "$@"
