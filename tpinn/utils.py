"""Utility surface: ``ns.utils.{HistoryPlotCallback, plot_history, load_json}``.

Reference call sites: Examples/Poiseuille_Flow/poiseuille_flow.py:266-268
(callback), poisson.py:82-83 (plot_history / load_json).
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_json(path) -> dict:
    with open(path) as f:
        return json.load(f)


def save_json(obj, path) -> None:
    parent = os.path.dirname(str(path))
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def _plot_history_dict(history: dict, filename=None, gui: bool = False):
    import matplotlib

    if not gui:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    iters = history["log"]["iter"]
    ax.plot(iters, history["log"]["loss_global"], "k-", linewidth=2, label="global")
    for name, entry in history.get("losses", {}).items():
        ax.plot(
            iters,
            entry["weight"] * np.asarray(entry["log"]),
            linewidth=1.0,
            label=name,
        )
    for name, entry in history.get("losses_test", {}).items():
        ax.plot(
            iters,
            entry["weight"] * np.asarray(entry["log"]),
            "--",
            linewidth=1.0,
            label=name,
        )
    rounds = history.get("log_rounds", {})
    for rname, start in zip(
        rounds.get("rounds", []), rounds.get("iteration_start", [])
    ):
        ax.axvline(start, color="gray", alpha=0.5)
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
    ax.grid()
    ax.set_xlabel("# Iterations", fontsize=15)
    ax.set_ylabel("Losses Values", fontsize=15)
    ax.legend(loc=1, fontsize=9)
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    elif gui:
        plt.show()
    return fig


def plot_history(path, filename=None, gui: bool = False):
    """Render a saved History_Loss.json to a loss-trend figure."""
    history = load_json(path)
    if filename is None and not gui:
        filename = os.path.splitext(str(path))[0] + ".png"
    return _plot_history_dict(history, filename=filename, gui=gui)


class CheckpointCallback:
    """Periodic full-state flush: params + history cursor survive a crash.

    The reference's only resilience is the history flush every 100 iters
    (SURVEY.md §5.3); this adds recoverable model state on the same cadence.
    Restore with ``tpinn.checkpoint.load_checkpoint`` → ``variables.set``.
    """

    def __init__(self, path, frequency: int = 100):
        self.path = str(path)
        self.frequency = int(frequency)
        self._last_fired = None

    def __call__(self, pb, iteration: int, force: bool = False) -> None:
        if not force:
            # rate-based, not alignment-based: resumed rounds start at
            # arbitrary global offsets (e.g. 20102) where
            # `iteration % frequency == 0` may never coincide with a log
            # point — the flush would silently never fire
            if self.frequency <= 0 or (
                self._last_fired is not None
                and iteration - self._last_fired < self.frequency
            ):
                return
        self._last_fired = iteration
        from tpinn.checkpoint import save_checkpoint

        save_checkpoint(
            self.path,
            pb.variables.get(),
            opt_state=pb.last_opt_state,
            extra={
                "iteration": iteration,
                "rounds": list(pb.history.round_names),
                "round_name": pb.last_round_name,
            },
        )


class HistoryPlotCallback:
    """Periodic history flush + loss-trend plot.

    nisaba contract (SURVEY.md §2.1): appended to ``pb.callbacks``; every
    ``frequency`` iterations refreshes the loss-trend PNG and rewrites the
    history JSON.  This periodic flush is the reference's only resilience
    mechanism (SURVEY.md §5.3) — preserved here for the same reason.
    """

    def __init__(
        self,
        frequency: int = 100,
        gui: bool = False,
        filename=None,
        filename_history=None,
        plot: bool = True,
    ):
        self.frequency = int(frequency)
        self.gui = gui
        self.filename = filename
        self.filename_history = filename_history
        self.plot = plot
        self._last_fired = None

    def __call__(self, pb, iteration: int, force: bool = False) -> None:
        if not force:
            # rate-based (see CheckpointCallback): resumed rounds start at
            # arbitrary offsets where modulo alignment can never fire
            if self.frequency <= 0 or (
                self._last_fired is not None
                and iteration - self._last_fired < self.frequency
            ):
                return
        self._last_fired = iteration
        if self.filename_history:
            pb.history.save(self.filename_history)
        if self.plot and self.filename:
            try:
                _plot_history_dict(
                    pb.history.to_dict(), filename=self.filename, gui=False
                )
            except Exception:
                pass  # plotting must never kill a training run
