"""Parametric stenosis (blob) geometry sketch — design aid.

Rebuilds the reference's coronary-geometry design script
(Examples_Old/Coronary_Flow/Coronary_Image_Generator.py): a sech²-shaped
stenosis bump inside a channel, used to design the coroParam.geo gmsh
geometry (the ``sten1``/``sten2`` parameters at coroParam.geo:4-5 control the
same bump).
"""

from __future__ import annotations

import numpy as np


def stenosis_profile(x, channel_height: float = 10.0, c: float = 0.2):
    """Bump height profile: max_blob·c / (2·cosh²(x√c/2))."""
    x = np.asarray(x, dtype=float)
    max_blob = (channel_height / 3.0) * (2.0 / c)
    r_c = np.sqrt(c)
    return max_blob * c / (2.0 * np.cosh(x * r_c / 2.0) ** 2)


def sketch(
    length: float = 40.0,
    height: float = 10.0,
    c: float = 0.2,
    n: int = 1000,
    filename=None,
):
    """Channel + stenosis outline figure (reference's Figure 1 design aid)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xx = np.linspace(-10.0, 10.0, n + 1)
    blob = stenosis_profile(xx, height, c)

    fig = plt.figure(1, figsize=(12, 3))
    ax = fig.add_subplot()
    eps = 0.3
    ax.axis([-length / 2, length / 2, -eps, height + eps])
    ax.axis("equal")
    for x0 in (-length / 2, length / 2):
        ax.axvline(x0, 0, height, c="r")
    for y0 in (0.0, height):
        ax.axhline(y0, -length / 2, length / 2, c="r")
    ax.plot(xx, blob, "k")
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig
