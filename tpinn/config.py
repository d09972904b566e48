"""Global configuration: dtype policy and legacy options-file parsing.

Reference contract (SURVEY.md §2.1): ``ns.config.get_dtype()`` returns the
global float dtype used to build every sampled tensor
(reference: Examples/Poisson_Problem/poisson.py:47-52, float64 throughout).

TPU-native policy: TPU v5e has no hardware float64, so the default dtype is
float64 only when JAX x64 mode is enabled (CPU parity/test runs) and float32
otherwise (TPU runs).  Residual pre-normalization (tpinn.losses /
the spread-normalization in the drivers) is what keeps float32 training
on par with the reference's float64 accuracy.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

_dtype_override: Optional[jnp.dtype] = None


def get_dtype():
    """Return the global float dtype (nisaba: ns.config.get_dtype())."""
    if _dtype_override is not None:
        return _dtype_override
    if jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32


def set_dtype(dtype) -> None:
    """Override the global float dtype (None restores the automatic policy)."""
    global _dtype_override
    _dtype_override = None if dtype is None else jnp.dtype(dtype)


def enable_x64(enable: bool = True) -> None:
    """Convenience wrapper around jax.config to toggle float64 support."""
    jax.config.update("jax_enable_x64", enable)


@dataclasses.dataclass
class SimulationOptions:
    """Typed run configuration.

    Mirrors the 10-field legacy ``simulation_options.txt`` format
    (reference: Examples/Poiseuille_Flow/poiseuille_flow.py:37-58 parses
    every other line positionally; a zero point-count disables that loss
    group — :54-58).
    """

    epochs: int = 10000
    noise_fit: float = 0.0
    noise_bnd: float = 0.0
    n_pde: int = 1000
    n_bc: int = 100
    n_ic: int = 100
    n_vel: int = 10
    n_pres: int = 0
    n_test: int = 1000

    @property
    def n_pts(self) -> dict:
        return {
            "PDE": self.n_pde,
            "BC": self.n_bc,
            "IC": self.n_ic,
            "Vel": self.n_vel,
            "Pres": self.n_pres,
            "Test": self.n_test,
        }

    @property
    def use_collloss(self) -> bool:
        return self.n_pde > 0

    @property
    def use_boundary(self) -> bool:
        return self.n_bc > 0

    @property
    def use_initialc(self) -> bool:
        return self.n_ic > 0

    @property
    def fit_velocity(self) -> bool:
        return self.n_vel > 0

    @property
    def fit_pressure(self) -> bool:
        return self.n_pres > 0

    @classmethod
    def from_file(cls, path: str | os.PathLike) -> "SimulationOptions":
        """Parse the legacy every-other-line text format.

        Line 0 is the ``###`` header (skipped, like simulation_options[0]
        in the reference), then value lines at odd positions.
        """
        with open(path) as f:
            # Same positional slice as the reference drivers (:40).
            fields = f.readlines()[0:-1:2]
        return cls(
            epochs=int(fields[1]),
            noise_fit=float(fields[2]),
            noise_bnd=float(fields[3]),
            n_pde=int(fields[4]),
            n_bc=int(fields[5]),
            n_ic=int(fields[6]),
            n_vel=int(fields[7]),
            n_pres=int(fields[8]),
            n_test=int(fields[9]),
        )

    def to_file(self, path: str | os.PathLike) -> None:
        """Write back in the legacy format (round-trip compatible)."""
        rows = [
            ("### Put this file into the folder of the given problem ###", None),
            ("TRAINING EPOCHS", self.epochs),
            ("NOISE ON FITTING", self.noise_fit),
            ("NOISE ON BOUNDARY", self.noise_bnd),
            ("POINTS PDE", self.n_pde),
            ("POINTS BOUNDARY CONDITIONS", self.n_bc),
            ("POINTS INITIAL CONDITIONS", self.n_ic),
            ("POINTS VELOCITY FITTING", self.n_vel),
            ("POINTS PRESSURE FITTING", self.n_pres),
            ("POINT TEST EVALUATION", self.n_test),
        ]
        lines = []
        for label, value in rows:
            if value is None:
                lines.append(label)
            else:
                lines.append(label)
                lines.append(str(value))
        lines.append("### End of the File ###")
        with open(path, "w") as f:
            f.write("\n".join(lines))


def read_simulation_options(path) -> SimulationOptions:
    return SimulationOptions.from_file(path)
