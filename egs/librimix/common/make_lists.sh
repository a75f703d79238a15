#!/bin/bash
# Emit <split>.lst (utterance ids) from a LibriMix split's mix_both/ dir so
# the wsj0mix datasets can index it: ./make_lists.sh <split_dir> [mix_dirname]
split="$1"; mixdir="${2:-mix_both}"
ls "$split/$mixdir" | sed 's/\.wav$//' > "$split.lst"
wc -l "$split.lst"
