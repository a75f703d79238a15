#!/bin/bash
# MUSDB18 / Conditioned-U-Net training recipe (TPU): FiLM conditioning,
# L1 loss. Mirrors reference egs/musdb18/cunet/train.sh (fft 1024/768,
# adam lr=1e-3); all stem conditions are trained per batched step.
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
musdb18_root="${musdb18_root:-../../../dataset/MUSDB18}"
exp_dir="${exp_dir:-./exp}"
mkdir -p "$exp_dir"
conditioning="${conditioning:-film}"

python -m dnn_based_source_separation_tpu.cli.train_musdb18 \
    --musdb18_root "$musdb18_root" --exp_dir "$exp_dir" \
    --model cunet --conditioning "$conditioning" --criterion l1loss \
    --n_fft 1024 --hop_length 768 \
    --cunet_channels 2,16,32,64,128,256 --cunet_control_channels 4,16,64 \
    --batch_size 4 --lr 1e-3 \
    "$@" | tee -a "$exp_dir/train.log"
