"""Materialize a temple-like Middlebury dataset on disk (ppm + par.txt).

The reference's second canonical workload is templeSparseRing
(/root/reference/run_temple.sh:1), which is not bundled.  This renders a
synthetic stand-in with the same on-disk layout so the CLI can be driven
with the exact run_temple.sh flag shape:

    python tools/make_temple_dataset.py /tmp/templeSparseRing
    python main.py -img_p /tmp/templeSparseRing \
        -par_p /tmp/templeSparseRing/templeSR_par.txt -t ppm -scale 1

Ground truth is closed-form (two spheres; sfm_tpu.utils.synth.
surface_distance), so the run's dense cloud can be checked against exact
geometry — something the real temple never allowed.
"""

import sys

from sfm_tpu.utils import synth


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/templeSparseRing"
    d, par, spheres = synth.write_middlebury_dataset(out)
    print(f"wrote {d} ({par}); spheres={spheres}")


if __name__ == "__main__":
    main()
