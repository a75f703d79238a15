#!/bin/bash
# Stage WHAM! for the recipes (counterpart of the reference's
# prepare_wham.sh). Pre-stage the official wham_noise + wsj0-2mix locally,
# run the official wham creation scripts, then point the recipe at the
# resulting wav directories (mix_{single,both,clean}/s1/s2/noise layout):
#   wav_root_train=.../wav8k/min/tr list_train=... ./../conv-tasnet/train.sh
echo "WHAM! must be generated from local wsj0 + wham_noise (no egress)."
echo "See the header of this script for the expected layout."
