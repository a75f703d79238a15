#!/bin/bash
# Stage DSD100. Counterpart of reference egs/dsd100/common/prepare_dsd100.sh;
# the musdb18 recipes consume it after the layout conversion below.
set -e
dsd100_root="${dsd100_root:-../../../dataset/DSD100}"
if [ ! -d "$dsd100_root/Sources" ]; then
    mkdir -p "$dsd100_root"
    wget "http://liutkus.net/DSD100.zip" -P /tmp
    unzip -q /tmp/DSD100.zip -d "$(dirname "$dsd100_root")" && rm /tmp/DSD100.zip
fi
# Convert to the musdb18 directory layout (train/<track>/{mixture,stems}.wav)
python - "$dsd100_root" <<'PY'
import os, shutil, sys
root = sys.argv[1]
for split_src, split_dst in (("Dev", "train"), ("Test", "test")):
    src = os.path.join(root, "Sources", split_src)
    mix = os.path.join(root, "Mixtures", split_src)
    if not os.path.isdir(src):
        continue
    for track in sorted(os.listdir(src)):
        dst = os.path.join(root, split_dst, track)
        os.makedirs(dst, exist_ok=True)
        for stem in ("bass", "drums", "other", "vocals"):
            s = os.path.join(src, track, f"{stem}.wav")
            if os.path.exists(s):
                shutil.copy(s, os.path.join(dst, f"{stem}.wav"))
        m = os.path.join(mix, track, "mixture.wav")
        if os.path.exists(m):
            shutil.copy(m, os.path.join(dst, "mixture.wav"))
PY
