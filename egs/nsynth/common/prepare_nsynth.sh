#!/bin/bash
# Stage NSynth. Counterpart of reference egs/nsynth/common/prepare_nsynth.sh.
set -e
nsynth_root="${nsynth_root:-../../../dataset/nsynth}"
mkdir -p "$nsynth_root"
for split in train valid test; do
    [ -d "$nsynth_root/nsynth-$split" ] && continue
    wget "http://download.magenta.tensorflow.org/datasets/nsynth/nsynth-$split.jsonwav.tar.gz" -P /tmp
    tar -zxf "/tmp/nsynth-$split.jsonwav.tar.gz" -C "$nsynth_root" && rm "/tmp/nsynth-$split.jsonwav.tar.gz"
done
