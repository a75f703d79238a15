#!/bin/bash
# MUSDB18 / Meta-TasNet training recipe (TPU): generated-weight TCN,
# single-stage mono (reference egs/musdb18/meta-tasnet/train.sh runs a
# 3-rate cascade; stack stages by re-running with --continue_from).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir" \
    --model meta-tasnet \
    -N 440 -L 20 -HH 160 -B 160 -Sc 160 -X 8 -R 3 \
    --duration 8 --batch_size 4 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
