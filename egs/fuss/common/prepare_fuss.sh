#!/bin/bash
# Stage FUSS (Free Universal Sound Separation). Counterpart of reference
# egs/fuss/common/prepare_fuss.sh (zenodo record 3743844).
set -e
fuss_root="${fuss_root:-../../../dataset/FUSS}"
mkdir -p "$fuss_root"
for file in FUSS_ssdata.tar.gz FUSS_ssdata_reverb.tar.gz FUSS_fsd_data.tar.gz; do
    d="$fuss_root/$(basename $file .tar.gz | cut -d_ -f2-)"
    [ -d "$fuss_root/${file#FUSS_}" ] && continue
    wget "https://zenodo.org/record/3743844/files/$file" -P /tmp
    tar -zxf "/tmp/$file" -C "$fuss_root" && rm "/tmp/$file"
done
