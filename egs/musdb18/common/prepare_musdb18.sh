#!/bin/bash
# Stage MUSDB18(-HQ) for the recipes (counterpart of the reference's
# prepare_musdb18.sh, which downloads via the musdb package; zero egress
# here, so point at a local copy).
#
# MUSDB18-HQ already ships wav stems per track (train/<name>/{mixture,
# bass,drums,other,vocals}.wav) -- exactly the layout the datasets read.
# This script only writes the split lists.
#
#   musdb18_root=/path/to/musdb18hq ./prepare_musdb18.sh
set -e
root="${musdb18_root:?set musdb18_root}"
ls "$root/train" > "$root/train.txt"
ls "$root/test"  > "$root/test.txt"
if [ ! -f "$root/validation.txt" ]; then
  # Default validation split: last 14 train tracks (musdb convention size).
  tail -n 14 "$root/train.txt" > "$root/validation.txt"
fi
wc -l "$root"/train.txt "$root"/validation.txt "$root"/test.txt
