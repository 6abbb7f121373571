"""Device->host fetch accounting.

Over the remote-TPU (axon) tunnel every device->host transfer pays a fixed
~23 ms latency with ~10% run-to-run weather — large enough that the whole
pipeline's warm wall (~0.7 s) moves by more than any single optimization
being measured (VERDICT r4: the round-4 headline could not be reconciled
with the driver capture because nothing recorded the channel's state).

Every *pipeline* fetch site (SfM pair payload, BA solution, MVS seed payload,
MVS per-chunk payload, reprojection-error metric, outlier-filter vis/proj)
funnels through :func:`fetch` so a harness can (a) count the exact number of
fixed-latency round trips a run paid and (b) normalize the measured wall by
the independently measured per-fetch latency — separating device+host compute
from tunnel weather (bench.py emits both).
"""

from __future__ import annotations

import numpy as np

_counts = {"n": 0}


def fetch(x) -> np.ndarray:
    """np.asarray(x), counted as one device->host round trip."""
    _counts["n"] += 1
    return np.asarray(x)


def count() -> int:
    """Total pipeline fetches since process start (monotonic)."""
    return _counts["n"]
