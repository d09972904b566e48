"""Readers/writers for the reference's data-file layouts.

The reference drivers ingest FEniCS exports with these layouts (all under
DataGeneration/data/, gitignored-absent in the reference — SURVEY.md §2.3):

* steady cavity h5 (cavity_steady.py:100-109):
    VisualisationVector/0 : (M, 2) velocity at the (n+1)² mesh vertices
    VisualisationVector/1 : (M,)   pressure
* unsteady per-step h5 ``...unsteady_%05d.h5`` (cavity_unsteady.py:104-113)
* coronary h5 (coronary_flow_steady.py:90-119) adds
    Mesh/0/mesh/geometry   : (M, 2) node coordinates
* regular-grid csv ``*_r.csv`` with columns x, y, ux, uy, p
  (fluid_solver_steady.py:122-137); unsteady adds a leading t column
* ``bpoints.npy``: (K, 4) labeled boundary points [x, y, z, flag] with flags
  0=NOSL, 1=INF, 2=OUT1, 3=OUT2 (coronary.py:64-66)

Vertex ordering: x fastest, matching both the FEM vertex order on a
RectangleMesh and the drivers' dom_grid construction.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def write_fields_h5(path, u, v, p, geometry: Optional[np.ndarray] = None) -> None:
    import h5py

    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        vis = f.create_group("VisualisationVector")
        vis.create_dataset("0", data=np.stack([u, v], axis=-1))
        vis.create_dataset("1", data=np.asarray(p))
        if geometry is not None:
            f.create_group("Mesh").create_group("0").create_group(
                "mesh"
            ).create_dataset("geometry", data=np.asarray(geometry))


def read_fields_h5(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    import h5py

    with h5py.File(path, "r") as f:
        vis = f["VisualisationVector"]
        vel = np.asarray(vis["0"])
        p = np.asarray(vis["1"])
    if p.ndim == 2:
        p = p[:, 0]
    return vel[:, 0], vel[:, 1], p


def read_mesh_geometry_h5(path) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f["Mesh"]["0"]["mesh"]["geometry"])


def unsteady_h5_path(folder, step: int, formulation: str = "navier-stokes_SI",
                     testcase: str = "cavity") -> str:
    return os.path.join(
        folder, f"{formulation}_{testcase}_unsteady_{step:05d}.h5"
    )


def write_unsteady_series_h5(folder, snaps: Sequence[Tuple], **kw) -> None:
    for it, (u, v, p) in enumerate(snaps):
        write_fields_h5(unsteady_h5_path(folder, it, **kw), u, v, p)


def read_unsteady_series_h5(folder, n_times: int, **kw):
    """Concatenated per-step fields, matching the reference's ingest loop
    (cavity_unsteady.py:110-113); pressure is mean-recentered per step as the
    reference does (pres_h5 lambda :107)."""
    us, vs, ps = [], [], []
    for it in range(n_times):
        u, v, p = read_fields_h5(unsteady_h5_path(folder, it, **kw))
        us.append(u)
        vs.append(v)
        ps.append(p - np.mean(p))
    return np.concatenate(us), np.concatenate(vs), np.concatenate(ps)


def write_regular_csv(path, x, y, ux, uy, p, t=None) -> None:
    import pandas as pd

    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    cols = {}
    if t is not None:
        cols["t"] = np.asarray(t)
    cols.update(
        {"x": np.asarray(x), "y": np.asarray(y), "ux": np.asarray(ux),
         "uy": np.asarray(uy), "p": np.asarray(p)}
    )
    pd.DataFrame(cols).to_csv(path, index=False)


def read_regular_csv(path):
    import pandas as pd

    df = pd.read_csv(path)
    out = {c: df[c].to_numpy() for c in df.columns}
    return out


def write_xdmf(path, h5_filename, n_points: int, time: float = 0.0) -> None:
    """Minimal XDMF wrapper referencing a fields h5 (the reference's FEM
    stage writes .xdmf + .h5 pairs, fluid_solver_steady.py:97-102; only the
    h5 is read by the drivers, so this exists for artifact-layout parity)."""
    xml = f"""<?xml version="1.0"?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Time Value="{time}" />
      <Attribute Name="u" AttributeType="Vector" Center="Node">
        <DataItem Dimensions="{n_points} 2" Format="HDF">{h5_filename}:/VisualisationVector/0</DataItem>
      </Attribute>
      <Attribute Name="p" AttributeType="Scalar" Center="Node">
        <DataItem Dimensions="{n_points}" Format="HDF">{h5_filename}:/VisualisationVector/1</DataItem>
      </Attribute>
    </Grid>
  </Domain>
</Xdmf>
"""
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(xml)


def bpoints_to_dict(arr: np.ndarray) -> dict:
    """(K, 4) labeled array → {NOSL, INF, OUT1, OUT2} of (K_i, 2) arrays
    (reference coronary_flow_steady.py:141-146)."""
    flags = {"NOSL": 0, "INF": 1, "OUT1": 2, "OUT2": 3}
    return {
        name: arr[arr[:, 3] == flag][:, 0:2] for name, flag in flags.items()
    }


def load_bpoints(path) -> dict:
    """Labeled boundary points {NOSL, INF, OUT1, OUT2} → (K_i, 2) arrays."""
    return bpoints_to_dict(np.load(path))
