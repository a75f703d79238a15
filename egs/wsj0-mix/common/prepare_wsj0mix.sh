#!/bin/bash
# Build the wsj0-mix corpus layout from a local WSJ0 copy + official task
# lists (counterpart of the reference's matlab/python creation scripts;
# this container has zero egress, so corpora must be pre-staged).
#
#   wsj0_root=/path/to/wsj0_wav list=/path/to/mix_2_spk_min_tr_mix \
#   out=/path/to/2speakers/wav8k/min/tr ./prepare_wsj0mix.sh
. "$(dirname "${BASH_SOURCE[0]}")/../../common/path.sh"
set -e
python -m dnn_based_source_separation_tpu.cli.create_mixtures \
    --list_path "$list" --wav_root "$wsj0_root" --out_root "$out" \
    --length "${length:-min}" --sample_rate "${sample_rate:-8000}"
ls "$out" | sed 's/^/  /'
