#!/bin/sh
# templeSparseRing invocation (mirrors the reference run_temple.sh:1; that
# dataset is not bundled with the reference either — point TEMPLE_DIR at a
# Middlebury templeSparseRing download).
TEMPLE_DIR="${TEMPLE_DIR:-./templeSparseRing}"
python main.py -img_p "$TEMPLE_DIR" \
    -par_p "$TEMPLE_DIR/templeSR_par.txt" -t png -scale 1 \
    --out_dir out_temple "$@"
