"""Coronary stenosis flow oracle: steady NS on the gmsh mesh.

Reference L0 stage: DataGeneration/coronary.py (FEniCS Newton NS on the
meshio-converted coroParam mesh, writes bpoints.npy and the FEM h5 the driver
reads).  Here the same mesh (Examples/Coronary_Flow/coroParam.msh) is solved
with the tpinn.oracles.fem P1-stabilized solver and written in the identical
h5 layout (VisualisationVector + Mesh geometry).

Physical parameters from the reference driver
(coronary_flow_steady.py:60-75): μ=1e-2, ρ=1.06e3, ν=1e4·μ/ρ, rotated
parabolic inflow with U=20 across the inlet width H=√(0.4²+0.1²).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from tpinn.oracles import fem, io
from tpinn.oracles.mesh import read_gmsh


@dataclasses.dataclass(frozen=True)
class CoronaryParams:
    mu: float = 1e-2
    rho: float = 1.06e3
    U: float = 20.0
    x0: float = -1.4
    y0: float = -0.8

    @property
    def ni(self) -> float:
        return 1e4 * self.mu / self.rho

    @property
    def H(self) -> float:
        return float(np.sqrt(0.4**2 + 0.1**2))

    @property
    def cos_theta(self) -> float:
        return float(np.cos(np.arctan(1 / 4)))

    @property
    def sin_theta(self) -> float:
        return float(np.sin(np.arctan(1 / 4)))


def inflow_profile(x, prm: CoronaryParams = CoronaryParams()):
    """Rotated parabolic inflow (reference coronary_flow_steady.py:72-75)."""
    x = np.asarray(x)
    s = np.sqrt((x[:, 0] - prm.x0) ** 2 + (x[:, 1] - prm.y0) ** 2) / prm.H
    mag = prm.U * s * (1.0 - s)
    return prm.cos_theta * mag, prm.sin_theta * mag


def refine_uniform(nodes: np.ndarray, triangles: np.ndarray):
    """One level of uniform (red) triangle refinement via edge midpoints.

    The original vertices keep their indices (0..M-1), so a field solved on
    the refined mesh restricts to the original nodes by slicing — used to
    upgrade the coronary oracle's accuracy (P1 velocity error ~ h², one
    refinement level ≈ 4× more accurate data on the driver's node set; the
    reference used Taylor–Hood P2/P1 elements, DataGeneration/coronary.py:70).
    """
    edges: dict = {}
    mids = []

    def mid(a: int, b: int) -> int:
        key = (a, b) if a < b else (b, a)
        idx = edges.get(key)
        if idx is None:
            idx = len(nodes) + len(mids)
            edges[key] = idx
            mids.append(0.5 * (nodes[key[0]] + nodes[key[1]]))
        return idx

    tris = []
    for a, b, c in triangles:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        tris.extend([[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]])
    new_nodes = np.concatenate([nodes, np.asarray(mids)], axis=0)
    return new_nodes, np.asarray(tris, dtype=triangles.dtype)


def classify_boundary(nodes2d: np.ndarray, bidx: np.ndarray,
                      tol: float = 1e-12) -> np.ndarray:
    """Flags for boundary vertex indices using the reference's subdomain
    predicates (DataGeneration/coronary.py:28-39): 1 inflow, 2 outflow-1,
    3 outflow-2, 0 no-slip wall.  Works on refined meshes too (edge
    midpoints of a marked segment still satisfy the linear predicate)."""
    x, y = nodes2d[bidx, 0], nodes2d[bidx, 1]
    marks = np.zeros(len(bidx), dtype=np.int64)
    marks[np.abs(y + 4.0 * x + 6.4) < tol] = 1
    marks[np.abs(y + 2.0 * x - 4.8) < tol] = 2
    marks[np.logical_and(np.abs(x - 1.2) < tol, y < 0)] = 3
    return marks


def boundary_vertices_of(tris: np.ndarray) -> np.ndarray:
    """Indices of vertices on the exterior boundary: vertices of triangle
    edges that belong to exactly one triangle (the FD analog of dolfin's
    BoundaryMesh(mesh, "exterior"), reference DataGeneration/coronary.py:53)."""
    edges = np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    bnd_edges = uniq[counts == 1]
    return np.unique(bnd_edges.reshape(-1))


def boundary_vertices(mesh) -> np.ndarray:
    return boundary_vertices_of(mesh.triangles)


def generate_bpoints(msh_path: str, tol: float = 1e-14) -> np.ndarray:
    """Labeled boundary-point array (N, 4): x, y, z, flag.

    Re-implements the reference's SubDomain marking
    (DataGeneration/coronary.py:24-66): flag 1 on the inflow line
    y + 4x + 6.4 = 0, flag 2 on the outflow-1 line y + 2x − 4.8 = 0,
    flag 3 on x = 1.2 with y < 0, flag 0 (no-slip wall) elsewhere.
    """
    mesh = read_gmsh(msh_path)
    bidx = boundary_vertices(mesh)
    pts = mesh.nodes[bidx]  # (N, 3)
    x, y = pts[:, 0], pts[:, 1]
    inflow = np.abs(y + 4.0 * x + 6.4) < tol
    outflow1 = np.abs(y + 2.0 * x - 4.8) < tol
    outflow2 = np.logical_and(np.abs(x - 1.2) < tol, y < 0)
    marks = (
        1 * inflow.astype(np.int64)
        + 2 * outflow1.astype(np.int64)
        + 3 * outflow2.astype(np.int64)
    )
    return np.hstack([pts, marks[:, None].astype(pts.dtype)])


def match_boundary_nodes(
    nodes: np.ndarray, bpoints: Dict[str, np.ndarray], tol: float = 1e-8
) -> Dict[str, np.ndarray]:
    """Map labeled bpoints.npy coordinates to mesh node indices."""
    from scipy.spatial import cKDTree

    tree = cKDTree(nodes[:, :2])
    out = {}
    for name, pts in bpoints.items():
        dist, idx = tree.query(pts)
        out[name] = np.unique(idx[dist < max(tol, 1e-6)])
        if len(out[name]) == 0 and len(pts):
            out[name] = np.unique(idx)
    return out


def solve_coronary(
    msh_path: str,
    bpoints_path: Optional[str] = None,
    prm: CoronaryParams = CoronaryParams(),
    picard_iters: int = 30,
    verbose: bool = False,
    refine: int = 0,
):
    """Solve steady NS on the coronary mesh; returns (nodes2d, u, v, p).

    ``bpoints_path`` is optional: when None the labeled boundary points are
    derived from the mesh itself (generate_bpoints), making the L0 stage
    self-contained.  ``refine``: levels of uniform red refinement before
    solving (the solution is restricted back to the original node set) —
    P1 error ~ h², so one level ≈ 4× more accurate oracle data.
    """
    mesh = read_gmsh(msh_path)
    nodes = mesh.nodes[:, :2]
    tris = mesh.triangles
    n_orig = nodes.shape[0]
    for _ in range(int(refine)):
        nodes, tris = refine_uniform(nodes, tris)

    dirichlet: Dict[int, Tuple[float, float]] = {}
    if refine == 0 and bpoints_path is not None:
        bflags = io.load_bpoints(bpoints_path)
        bidx = match_boundary_nodes(nodes, bflags)
        nosl, inf = bidx["NOSL"], bidx["INF"]
    else:
        # geometric classification (refinement-safe)
        ball = boundary_vertices_of(tris)
        marks = classify_boundary(nodes, ball)
        nosl = ball[marks == 0]
        inf = ball[marks == 1]
    for i in nosl:
        dirichlet[int(i)] = (0.0, 0.0)
    u_in, v_in = inflow_profile(nodes[inf], prm)
    for i, uu, vv in zip(inf, u_in, v_in):
        dirichlet[int(i)] = (float(uu), float(vv))
    # OUT1/OUT2 remain natural (do-nothing) — traction-free outflow, the
    # condition the driver's Neumann losses encode (weights 1e-3, :245-255).

    u, v, p = fem.solve_navier_stokes(
        nodes,
        tris,
        nu=prm.ni,
        dirichlet=dirichlet,
        picard_iters=picard_iters,
        verbose=verbose,
    )
    return (
        nodes[:n_orig],
        u[:n_orig],
        v[:n_orig],
        p[:n_orig],
    )


def outflow_edges(nodes2d: np.ndarray, tris: np.ndarray,
                  tol: float = 1e-12) -> np.ndarray:
    """Boundary edges lying on the two outflow lines (reference subdomains
    Outflow1: y + 2x − 4.8 = 0, Outflow2: x = 1.2 ∧ y < 0 —
    DataGeneration/coronary.py:33-39).  An edge belongs to an outflow when
    both endpoints satisfy its predicate."""
    edges, _, _ = fem.boundary_edges_with_normals(nodes2d, tris)
    x, y = nodes2d[:, 0], nodes2d[:, 1]
    on1 = np.abs(y + 2.0 * x - 4.8) < tol
    on2 = np.abs(x - 1.2) < tol
    a, b = edges[:, 0], edges[:, 1]
    mid_y = 0.5 * (y[a] + y[b])
    sel = (on1[a] & on1[b]) | (on2[a] & on2[b] & (mid_y < 0))
    return edges[sel]


def solve_coronary_unsteady(
    msh_path: str,
    prm: CoronaryParams = CoronaryParams(),
    t_end: float = 1e-2,
    dt: float = 1e-4,
    refine: int = 0,
    verbose: bool = False,
):
    """Semi-implicit unsteady NS on the coronary mesh (the reference's
    'navier-stokes_SI' formulation, DataGeneration/coronary.py:108-130):
    no-slip walls + rotated parabolic inflow as Dirichlet, and the
    (p/ν)(n·v) pressure surface terms on both outflow boundaries
    (ds(2) + ds(3)).  Returns (nodes2d, times, snaps) with one nodal
    (u, v, p) per time step, restricted to the original node set when
    ``refine`` > 0."""
    mesh = read_gmsh(msh_path)
    nodes = mesh.nodes[:, :2]
    tris = mesh.triangles
    n_orig = nodes.shape[0]
    for _ in range(int(refine)):
        nodes, tris = refine_uniform(nodes, tris)

    ball = boundary_vertices_of(tris)
    marks = classify_boundary(nodes, ball)
    dirichlet: Dict[int, Tuple[float, float]] = {}
    for i in ball[marks == 0]:
        dirichlet[int(i)] = (0.0, 0.0)
    inf = ball[marks == 1]
    u_in, v_in = inflow_profile(nodes[inf], prm)
    for i, uu, vv in zip(inf, u_in, v_in):
        dirichlet[int(i)] = (float(uu), float(vv))

    times, snaps = fem.solve_navier_stokes_unsteady(
        nodes,
        tris,
        nu=prm.ni,
        dirichlet=dirichlet,
        t_end=t_end,
        dt=dt,
        pressure_outflow_edges=outflow_edges(nodes, tris),
        verbose=verbose,
    )
    snaps = [(u[:n_orig], v[:n_orig], p[:n_orig]) for u, v, p in snaps]
    return nodes[:n_orig], times, snaps


def generate_coronary_unsteady(
    out_dir: str,
    msh_path: str,
    prm: CoronaryParams = CoronaryParams(),
    t_end: float = 1e-2,
    dt: float = 1e-4,
    refine: int = 0,
    verbose: bool = False,
) -> str:
    """Write the reference's unsteady coronary layout
    (DataGeneration/coronary.py:95-104 + :64-66): per-step
    ``navier-stokes_SI_coronary_unsteady_%05d.h5`` (+ .xdmf wrapper) and
    ``bpoints.npy`` under ``<out_dir>/Coronary/``."""
    folder = os.path.join(
        out_dir, "Coronary" if not refine else f"Coronary_r{int(refine)}"
    )
    kw = dict(formulation="navier-stokes_SI", testcase="coronary")
    n_times = len(np.arange(0.0, t_end, step=dt))
    last = io.unsteady_h5_path(folder, n_times - 1, **kw)
    bp_out = os.path.join(folder, "bpoints.npy")
    if os.path.exists(last) and os.path.exists(bp_out):
        return folder
    nodes, times, snaps = solve_coronary_unsteady(
        msh_path, prm, t_end=t_end, dt=dt, refine=refine, verbose=verbose
    )
    for it, ((u, v, p), t) in enumerate(zip(snaps, times)):
        h5 = io.unsteady_h5_path(folder, it, **kw)
        io.write_fields_h5(h5, u, v, p, geometry=nodes)
        io.write_xdmf(os.path.splitext(h5)[0] + ".xdmf",
                      os.path.basename(h5), len(nodes), time=float(t))
    os.makedirs(folder, exist_ok=True)
    np.save(bp_out, generate_bpoints(msh_path))
    return folder


def generate_coronary(
    out_dir: str,
    msh_path: str,
    bpoints_path: Optional[str] = None,
    prm: CoronaryParams = CoronaryParams(),
    verbose: bool = False,
    refine: int = 0,
) -> str:
    """Write steady_coronary_steady.h5 + bpoints.npy in the reference layout
    (coronary_flow_steady.py:90-119,141).  bpoints are derived from the mesh
    (generate_bpoints) unless an explicit file is given — the L0 stage has no
    reference-data dependency.

    ``refine`` levels of red refinement before solving go to a separate
    ``SteadyCase_r<k>`` folder (fields restricted back to the driver's
    original node set), so refined data never silently replaces the data an
    existing campaign trained on."""
    folder = os.path.join(
        out_dir, "SteadyCase" if not refine else f"SteadyCase_r{int(refine)}"
    )
    h5_path = os.path.join(folder, "steady_coronary_steady.h5")
    bp_out = os.path.join(folder, "bpoints.npy")
    if os.path.exists(h5_path) and os.path.exists(bp_out):
        return folder
    nodes, u, v, p = solve_coronary(
        msh_path, bpoints_path, prm, verbose=verbose, refine=refine
    )
    io.write_fields_h5(h5_path, u, v, p, geometry=nodes)
    os.makedirs(folder, exist_ok=True)
    bp = (
        np.load(bpoints_path) if bpoints_path is not None
        else generate_bpoints(msh_path)
    )
    np.save(bp_out, bp)
    return folder
