"""Backend selection helpers.

Pallas kernels are used on TPU by default; on CPU (tests, simulated meshes)
the pure-XLA fallbacks run instead.  ``RuntimeConfig.use_pallas`` overrides.
"""

from __future__ import annotations

from typing import Optional

import jax


def default_backend() -> str:
    return jax.default_backend()


def use_pallas(override: Optional[bool] = None) -> bool:
    if override is not None:
        return override
    return default_backend() == "tpu"
