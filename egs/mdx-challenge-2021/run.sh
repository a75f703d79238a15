#!/bin/bash
# MDX Challenge 2021 submission harness (TPU).
# Counterpart of reference egs/mdx-challenge-2021/run.sh + umx/submission.sh:
# run a trained musdb18 model over every mixture in a submission input
# directory, writing <track>/<stem>.wav estimates.
. "$(dirname "${BASH_SOURCE[0]}")/../common/path.sh"
model_path="${model_path:?set model_path=<musdb18 checkpoint>}"
input_dir="${input_dir:?set input_dir=<dir of <track>/mixture.wav>}"
out_dir="${out_dir:-./submission}"
sample_rate="${sample_rate:-44100}"

for track in "$input_dir"/*/; do
    name="$(basename "$track")"
    python -m dnn_based_source_separation_tpu.cli.separate \
        --model_path "$model_path" \
        --input "$track/mixture.wav" \
        --out_dir "$out_dir/$name" \
        --sample_rate "$sample_rate" \
        --chunk_duration 10 \
        "$@"
done
