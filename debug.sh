#!/bin/sh
# Debug invocation: epipolar/match overlays + scatter PNGs at viz scale 0.1
# (mirrors the reference debug.sh:1).
python main.py -img_p /root/reference/dinoRing \
    -par_p /root/reference/dinoRing/dinoR_par.txt -t png -scale 0.1 \
    --debug --plot --out_dir out_debug "$@"
