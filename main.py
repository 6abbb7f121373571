#!/usr/bin/env python3
"""CLI entry point: mirrors the reference invocation shape, e.g.

    python main.py -img_p /root/reference/dinoRing -par_p \
        /root/reference/dinoRing/dinoR_par.txt -t png -scale 10

(reference run.sh:1).  See ``python main.py --help`` for the full knob set.
"""
from sfm_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
