"""Post-processing visualization: exact-vs-PINN contour grids and loss trends.

Rebuilds pipeline stages 11–12 of the reference drivers (SURVEY.md §2.2):

* shared contour levels with 5·10^k rounding (poiseuille_flow.py:301-322);
* 3x2 contour figure exact-vs-PINN for u, v, p (poiseuille_flow.py:337-350);
* triangulated contours for unstructured-mesh cases
  (coronary_flow_steady.py:363-383);
* loss-trend plot with grouped per-loss weighted curves, symlog-x and
  optimizer-round annotations (poiseuille_flow.py:357-385).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def approx_scale(x: float, up: bool) -> float:
    """Round |x| outward to a 5·10^k-aligned level bound
    (reference poiseuille_flow.py:311-315)."""
    if x == 0:
        return 0.0
    factor = np.floor(np.log10(abs(x))) - 1
    if up:
        x = np.ceil(x / np.power(10.0, factor) / 5)
    else:
        x = np.floor(x / np.power(10.0, factor) / 5)
    return float(x * 5 * np.power(10.0, factor))


def shared_levels(exact, pinn, num_levels: int = 11) -> np.ndarray:
    """Contour levels spanning both fields (poiseuille_flow.py:301-320)."""
    lo = min(np.min(exact), np.min(pinn))
    hi = max(np.max(exact), np.max(pinn))
    lo, hi = approx_scale(lo, False), approx_scale(hi, True)
    if lo == hi:
        lo, hi = lo - 1e-12, hi + 1e-12
    return np.linspace(lo, hi, num_levels)


def contour_compare(
    grid_x,
    grid_y,
    exact_fields: Sequence,
    pinn_fields: Sequence,
    titles: Sequence[str] = ("u-velocity", "v-velocity", "Pressure"),
    problem_name: str = "",
    filename: Optional[str] = None,
    num_levels: int = 11,
):
    """3x2 exact-vs-PINN contour figure (reference Graphic.jpg)."""
    plt = _plt()
    n = len(exact_fields)
    fig, axes = plt.subplots(n, 2, figsize=(12, 8))
    if n == 1:
        axes = np.array([axes])
    fig.suptitle(
        f"Solutions of the {problem_name} problem", fontsize=18, y=0.97, x=0.50
    )
    for row, (ex, pinn, title) in enumerate(
        zip(exact_fields, pinn_fields, titles)
    ):
        levels = shared_levels(ex, pinn, num_levels)
        for col, (field, label) in enumerate(
            [(ex, f"Numerical {title}"), (pinn, f"PINNS {title}")]
        ):
            ax = axes[row][col]
            ax.title.set_text(label)
            cs = ax.contourf(grid_x, grid_y, field, levels=levels)
            fig.colorbar(cs, ax=ax)
    plt.tight_layout()
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig


def tricontour_compare(
    x,
    y,
    exact_fields: Sequence,
    pinn_fields: Sequence,
    titles: Sequence[str] = ("u-velocity", "v-velocity", "Pressure"),
    problem_name: str = "",
    filename: Optional[str] = None,
    num_levels: int = 11,
):
    """Unstructured-mesh variant using tricontourf
    (reference coronary_flow_steady.py:363-383)."""
    plt = _plt()
    n = len(exact_fields)
    fig, axes = plt.subplots(n, 2, figsize=(12, 8))
    if n == 1:
        axes = np.array([axes])
    fig.suptitle(
        f"Solutions of the {problem_name} problem", fontsize=18, y=0.97, x=0.50
    )
    for row, (ex, pinn, title) in enumerate(
        zip(exact_fields, pinn_fields, titles)
    ):
        levels = shared_levels(ex, pinn, num_levels)
        for col, (field, label) in enumerate(
            [(ex, f"Numerical {title}"), (pinn, f"PINNS {title}")]
        ):
            ax = axes[row][col]
            ax.title.set_text(label)
            cs = ax.tricontourf(
                np.asarray(x), np.asarray(y), np.asarray(field), levels=levels
            )
            fig.colorbar(cs, ax=ax)
    plt.tight_layout()
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig


def scatter3d_compare(
    x,
    y,
    exact,
    pinn,
    filename: Optional[str] = None,
    labels=("exact solution", "numerical solution"),
):
    """3-D scatter of exact vs PINN values over test points
    (reference poisson.py:85-91)."""
    plt = _plt()
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(np.asarray(x), np.asarray(y), np.asarray(exact), label=labels[0])
    ax.scatter(np.asarray(x), np.asarray(y), np.asarray(pinn), label=labels[1])
    ax.legend()
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig


def contour_time_slices(
    grid_x,
    grid_y,
    exact_slices,
    pinn_slices,
    times,
    n_times: int,
    folder,
    titles: Sequence[str] = ("u-velocity", "v-velocity", "Pressure"),
    num_levels: int = 11,
):
    """Per-time-slice exact-vs-PINN contour figures with per-field levels
    shared ACROSS all slices (reference cavity_unsteady.py:275-357; files
    ``Graphic_{i+1}_of_{n}.jpg``).

    ``exact_slices``/``pinn_slices``: per-field lists of per-slice 2-D arrays
    ``[[u_t0, u_t1, ...], [v_t0, ...], [p_t0, ...]]``.
    """
    plt = _plt()
    n_stamps = len(times)
    levels = []
    for ex_list, pinn_list in zip(exact_slices, pinn_slices):
        lo = min(min(np.min(e), np.min(p)) for e, p in zip(ex_list, pinn_list))
        hi = max(max(np.max(e), np.max(p)) for e, p in zip(ex_list, pinn_list))
        lo, hi = approx_scale(lo, False), approx_scale(hi, True)
        if lo == hi:
            lo, hi = lo - 1e-12, hi + 1e-12
        levels.append(np.linspace(lo, hi, num_levels))

    paths = []
    for i, t in enumerate(times):
        title = "Solutions when t = {0:.4f}".format(t)
        title += ", time step #{}/{}".format(
            int(i * (n_times / max(n_stamps - 1, 1))), n_times
        )
        fig, axes = plt.subplots(3, 2, figsize=(12, 8))
        fig.suptitle(title, fontsize=18, y=0.97, x=0.50)
        for row, name in enumerate(titles):
            for col, (field, label) in enumerate(
                [
                    (exact_slices[row][i], f"Numerical {name}"),
                    (pinn_slices[row][i], f"PINNS {name}"),
                ]
            ):
                ax = axes[row][col]
                ax.title.set_text(label)
                cs = ax.contourf(grid_x, grid_y, field, levels=levels[row])
                fig.colorbar(cs, ax=ax)
        plt.tight_layout()
        import os

        path = os.path.join(folder, f"Graphic_{i + 1}_of_{n_stamps}.jpg")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths


def plot_loss_groups(
    history: dict,
    groups: Dict[str, List[str]],
    filename: Optional[str] = None,
    dashed_groups: Sequence[str] = (),
):
    """Reference Loss_Trend_Reduced.png: global loss + grouped weighted
    per-loss means, symlog-x, optimizer-round annotations
    (poiseuille_flow.py:357-385)."""
    plt = _plt()
    from matplotlib import colormaps

    cmap = colormaps["Set1"]
    fig, ax = plt.subplots(figsize=(10, 8))
    iters = history["log"]["iter"]
    ax.plot(iters, history["log"]["loss_global"], "k-", linewidth=2)

    for i, (label, names) in enumerate(groups.items()):
        source = None
        for first_key in ("losses", "losses_test"):
            if all(n in history.get(first_key, {}) for n in names):
                source = first_key
                break
        if source is None:
            continue
        vals = [
            history[source][n]["weight"] * np.asarray(history[source][n]["log"])
            for n in names
        ]
        value_tot = sum(vals) / len(names)
        style = "--" if label in dashed_groups or source == "losses_test" else "-"
        lw = 3.0 if source == "losses_test" else 1.5
        ax.plot(iters, value_tot, style, color=cmap(i), linewidth=lw, label=label)

    rounds = history.get("log_rounds", {})
    for rname, start in zip(
        rounds.get("rounds", []), rounds.get("iteration_start", [])
    ):
        ax.axvline(start, 0, 1, c=cmap(5))
        ax.text(
            max(start, 1),
            0.3,
            rname,
            rotation=90,
            bbox={
                "facecolor": "lightgray",
                "alpha": 0.7,
                "edgecolor": "black",
                "pad": 3,
            },
        )

    ax.set_xscale("symlog", linthresh=100, linscale=1)
    ax.set_yscale("log")
    ax.legend(loc=1, fontsize=15)
    ax.grid()
    ax.set_xlabel("# Iterations", fontsize=15)
    ax.set_ylabel("Losses Values", fontsize=15)
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig
