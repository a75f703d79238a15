#!/bin/bash
# MUSDB18 / umx training recipe (TPU).
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/musdb18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" \
    --model umx \
    --n_fft 4096 --hop_length 1024 --max_bin 1487 \
    --hidden_channels 512 --num_layers 3 \
    --exp_dir "$exp_dir" \
    "$@" | tee -a "$exp_dir/train.log"
