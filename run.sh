#!/bin/sh
# Canonical full-pipeline invocation on the bundled dinoRing dataset
# (mirrors the reference run.sh:1).
python main.py -img_p /root/reference/dinoRing \
    -par_p /root/reference/dinoRing/dinoR_par.txt -t png -scale 10 \
    --out_dir out "$@"
