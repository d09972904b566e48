"""Data generation entry point — the offline L0 stage, JAX-native.

Replaces DataGeneration/fluid_solver_{steady,unsteady}.py (FEniCS-in-Docker,
SURVEY.md §3.4) with the tpinn.oracles.cavity solver, writing the exact file
layout the drivers ingest.  Files are produced once and cached; run on TPU
for speed or CPU for reproducibility.

    python -m tpinn.oracles.generate --case steady --out data
    python -m tpinn.oracles.generate --case unsteady --out data
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpinn.oracles import cavity, io


def generate_cavity_steady(
    out_dir: str,
    U: float = 500.0,
    nu: float = 1.0,
    n_solver: int = 192,
    n_out: int = 100,
    t_end: float = 50.0,
) -> str:
    """Steady cavity at Re = U/ν; writes the reference steady-case files.

    Solves on an ``n_solver`` grid and interpolates to the (n_out+1)² vertex
    grid the drivers use (reference mesh: 100×100 RectangleMesh →
    101² vertices, fluid_solver_steady.py:12-13,28).
    """
    folder = os.path.join(out_dir, "SteadyCase")
    h5_path = os.path.join(folder, "navier-stokes_cavity_steady.h5")
    csv_path = os.path.join(folder, "navier-stokes_cavity_steady_r.csv")
    rand_csv_path = os.path.join(folder, "navier-stokes_cavity_steady.csv")
    if os.path.exists(h5_path) and os.path.exists(csv_path):
        if not os.path.exists(rand_csv_path):
            # derive the random-point csv from the CACHED h5 fields (keeps
            # all three files consistent with whatever solve produced them)
            u_o, v_o, p_o = io.read_fields_h5(h5_path)
            _write_random_csv(rand_csv_path, u_o, v_o, p_o, n_out)
        _ensure_xdmf(h5_path, (n_out + 1) ** 2)
        return folder

    re = U * 1.0 / nu
    u, v, p = cavity.solve_cavity_steady(re=re, n=n_solver, t_end=t_end)
    # dimensional fields: u_phys = U u*, p_phys = ρ U² p* (ρ = 1)
    u, v, p = U * u, U * v, U * U * p

    xq, yq = cavity.vertex_grid(n_out)
    u_o = cavity.interpolate_vertex_field(u, n_solver, xq, yq)
    v_o = cavity.interpolate_vertex_field(v, n_solver, xq, yq)
    p_o = cavity.interpolate_vertex_field(p, n_solver, xq, yq)
    io.write_fields_h5(h5_path, u_o, v_o, p_o,
                       geometry=np.stack([xq, yq], axis=-1))

    # 100×100 regular-grid csv (fluid_solver_steady.py:122-137)
    xs = np.linspace(0, 1, 100)
    ys = np.linspace(0, 1, 100)
    xg = np.array([x for y in ys for x in xs])
    yg = np.array([y for y in ys for x in xs])
    io.write_regular_csv(
        csv_path,
        xg,
        yg,
        cavity.interpolate_vertex_field(u, n_solver, xg, yg),
        cavity.interpolate_vertex_field(v, n_solver, xg, yg),
        cavity.interpolate_vertex_field(p, n_solver, xg, yg),
    )

    _write_random_csv(rand_csv_path, u_o, v_o, p_o, n_out)
    _ensure_xdmf(h5_path, (n_out + 1) ** 2)
    return folder


def _ensure_xdmf(h5_path: str, n_points: int, time: float = 0.0) -> None:
    """Emit the .xdmf wrapper next to a fields h5 (the reference FEM stage
    writes .xdmf + .h5 pairs, fluid_solver_steady.py:94-102; drivers only
    read the h5, so the wrapper exists for artifact-layout parity)."""
    xdmf_path = os.path.splitext(h5_path)[0] + ".xdmf"
    if not os.path.exists(xdmf_path):
        io.write_xdmf(xdmf_path, os.path.basename(h5_path), n_points,
                      time=time)


def _write_random_csv(path, u_o, v_o, p_o, n_out: int,
                      n_points: int = 5000) -> None:
    """Random-point csv (fluid_solver_steady.py:106-118) — the file the old
    CSV-driven driver slices positionally into PDE/col/test/pres sets.
    Sampled (seeded) from the (n_out+1)² vertex fields so it is always
    consistent with the cached h5."""
    rng = np.random.default_rng(0)
    xr = rng.random(n_points)
    yr = rng.random(n_points)
    io.write_regular_csv(
        path,
        xr,
        yr,
        cavity.interpolate_vertex_field(u_o, n_out, xr, yr),
        cavity.interpolate_vertex_field(v_o, n_out, xr, yr),
        cavity.interpolate_vertex_field(p_o, n_out, xr, yr),
    )


def generate_cavity_unsteady(
    out_dir: str,
    U: float = 1.0,
    nu: float = 1.0,
    T: float = 1e-2,
    dt: float = 1e-4,
    n: int = 100,
) -> str:
    """Unsteady cavity per-timestep h5 series (fluid_solver_unsteady.py)."""
    folder = os.path.join(out_dir, "UnsteadyCase")
    n_times = int(round(T / dt))
    last = io.unsteady_h5_path(folder, n_times - 1)
    csv_path = os.path.join(folder, "navier-stokes_SI_cavity_unsteady_r.csv")
    if os.path.exists(last):
        for it in range(n_times):
            h5 = io.unsteady_h5_path(folder, it)
            _ensure_xdmf(h5, _h5_n_points(h5), time=it * dt)
        if not os.path.exists(csv_path):
            # derive the regular-grid csv from the CACHED h5 series (the csv
            # is gitignored like the reference's FEM outputs; keep it
            # consistent with whatever solve produced the h5 files)
            times = [it * dt for it in range(n_times)]
            snaps = [
                io.read_fields_h5(io.unsteady_h5_path(folder, it))
                for it in range(n_times)
            ]
            _write_unsteady_regular_csv(csv_path, times, snaps, n)
        return folder
    times, snaps = cavity.solve_cavity_unsteady(
        nu=nu, lid_velocity=U, t_end=T, dt_out=dt, n=n
    )
    io.write_unsteady_series_h5(folder, snaps)
    # per-step .xdmf wrappers (reference fluid_solver_unsteady.py:86-95)
    for it, t in enumerate(times):
        h5 = io.unsteady_h5_path(folder, it)
        _ensure_xdmf(h5, _h5_n_points(h5), time=t)
    _write_unsteady_regular_csv(csv_path, times, snaps, n)
    return folder


def _h5_n_points(h5_path: str) -> int:
    import h5py

    with h5py.File(h5_path, "r") as f:
        return int(f["VisualisationVector"]["0"].shape[0])


def _write_unsteady_regular_csv(csv_path, times, snaps, n: int) -> None:
    """Concatenated regular-grid csv with a leading t column (reference
    fluid_solver_unsteady.py:71-84 writes ..._r.csv consumed by the drivers'
    per-time-slice post-processing)."""
    xs = np.linspace(0, 1, 100)
    xg = np.array([x for y in xs for x in xs])
    yg = np.array([y for y in xs for x in xs])
    cols_t, cols_x, cols_y, cols_u, cols_v, cols_p = [], [], [], [], [], []
    for t, (u, v, p) in zip(times, snaps):
        cols_t.append(np.full(xg.shape, t))
        cols_x.append(xg)
        cols_y.append(yg)
        cols_u.append(cavity.interpolate_vertex_field(u, n, xg, yg))
        cols_v.append(cavity.interpolate_vertex_field(v, n, xg, yg))
        cols_p.append(cavity.interpolate_vertex_field(p, n, xg, yg))
    io.write_regular_csv(
        csv_path,
        np.concatenate(cols_x), np.concatenate(cols_y),
        np.concatenate(cols_u), np.concatenate(cols_v),
        np.concatenate(cols_p), t=np.concatenate(cols_t),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["steady", "unsteady", "all"], default="all")
    ap.add_argument("--out", default="data")
    ap.add_argument("--n-solver", type=int, default=192)
    args = ap.parse_args(argv)
    if args.case in ("steady", "all"):
        print("generating steady cavity data ...")
        print(" ->", generate_cavity_steady(args.out, n_solver=args.n_solver))
    if args.case in ("unsteady", "all"):
        print("generating unsteady cavity data ...")
        print(" ->", generate_cavity_unsteady(args.out))


if __name__ == "__main__":
    main()
