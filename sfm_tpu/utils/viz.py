"""Optional matplotlib visualization (debug aids).

Covers the reference's plotting surface: 3-D scatter of clouds before/after
BA and of the dense cloud (SFM.py:131-140, 186-197; MVS2.py:291-294), and
epipolar-line / match overlays for a pair in debug mode (DebugShow/drawlines,
utils.py:114-158, 21-53).  All functions save to files (headless-friendly)
and import matplotlib lazily.
"""

from __future__ import annotations

import numpy as np


def scatter3d(points, colors=None, scale: float = 1.0, title: str = "",
              path: str | None = None):
    """3-D scatter of a point cloud; saves PNG if ``path`` given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points) * scale
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.set_title(title)
    c = None
    if colors is not None:
        c = np.asarray(colors).reshape(-1, 3) / 255.0
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=c, s=1, linewidth=0.1)
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def draw_epipolar_debug(img1, img2, pts1, pts2, F, path: str | None = None,
                        max_lines: int = 30):
    """Epiline + match overlay for one pair (reference DebugShow analogue)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from sfm_tpu.geometry.epipolar import epipolar_lines

    pts1 = np.asarray(pts1)[:max_lines]
    pts2 = np.asarray(pts2)[:max_lines]
    lines2 = np.asarray(epipolar_lines(jnp.asarray(F), jnp.asarray(pts1), 1))
    lines1 = np.asarray(epipolar_lines(jnp.asarray(F), jnp.asarray(pts2), 2))

    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    h, w = img1.shape[:2]
    for ax, img, pts, lines in (
        (axes[0], img1, pts1, lines1),
        (axes[1], img2, pts2, lines2),
    ):
        ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        for (x, y), (a, b, c) in zip(pts, lines):
            ax.plot(x, y, "o", markersize=3)
            if abs(b) > 1e-9:
                xs = np.asarray([0.0, w])
                ys = -(a * xs + c) / b
                ax.plot(xs, ys, linewidth=0.5)
        ax.set_xlim(0, w)
        ax.set_ylim(h, 0)
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig
