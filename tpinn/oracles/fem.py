"""P1–P1 stabilized finite-element Navier–Stokes solver on triangle meshes.

Replaces the reference's FEniCS coronary solver (DataGeneration/coronary.py:
Taylor–Hood Newton NS on the gmsh stenosis mesh) for offline data generation.
Runs on the *actual* ``coroParam.msh`` triangulation (read with
tpinn.oracles.mesh.read_gmsh), so the generated "exact" fields live on the
same mesh nodes the driver ingests (reference coronary_flow_steady.py:94-106
reads node coordinates + nodal fields from the FEM h5).

Formulation: equal-order P1 velocity/pressure with Brezzi–Pitkäranta
stabilization (−α Σ_T h_T² (∇p, ∇q)_T) to satisfy inf-sup; convection by
Picard iteration; outflow via the do-nothing natural condition.  Assembly is
vectorized numpy; the sparse saddle system is solved with scipy's direct
solver — this is the host-side offline L0 stage (SURVEY.md §3.4), not the
TPU compute path.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _triangle_geometry(nodes: np.ndarray, tris: np.ndarray):
    """Per-triangle areas and P1 basis gradients.

    Returns (area (T,), grads (T, 3, 2)) with grads[t, a] = ∇λ_a on tri t.
    """
    p0 = nodes[tris[:, 0]]
    p1 = nodes[tris[:, 1]]
    p2 = nodes[tris[:, 2]]
    d1 = p1 - p0
    d2 = p2 - p0
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * np.abs(det)
    # gradients of barycentric coordinates
    inv_det = 1.0 / det
    b = np.empty((len(tris), 3, 2))
    b[:, 1, 0] = d2[:, 1] * inv_det
    b[:, 1, 1] = -d2[:, 0] * inv_det
    b[:, 2, 0] = -d1[:, 1] * inv_det
    b[:, 2, 1] = d1[:, 0] * inv_det
    b[:, 0] = -b[:, 1] - b[:, 2]
    return area, b


def _assemble_stiffness(nodes, tris, area, grads) -> sp.csr_matrix:
    """K_ij = ∫ ∇φ_i · ∇φ_j."""
    T = len(tris)
    rows = np.repeat(tris, 3, axis=1).reshape(T, 9)
    cols = np.tile(tris, (1, 3)).reshape(T, 9)
    ke = np.einsum("tad,tbd->tab", grads, grads) * area[:, None, None]
    vals = ke.transpose(0, 2, 1).reshape(T, 9)
    M = len(nodes)
    return sp.coo_matrix(
        (vals.ravel(), (rows.ravel(), cols.ravel())), shape=(M, M)
    ).tocsr()


def _assemble_divergence(nodes, tris, area, grads) -> Tuple[sp.csr_matrix, sp.csr_matrix]:
    """B(d)_ij = ∫ φ_i ∂φ_j/∂x_d  (pressure-test × velocity-trial)."""
    T = len(tris)
    M = len(nodes)
    rows = np.repeat(tris, 3, axis=1).reshape(T, 9)
    cols = np.tile(tris, (1, 3)).reshape(T, 9)
    third = area / 3.0
    out = []
    for d in range(2):
        # ∫_T φ_a ∂φ_b/∂x_d = (area/3) ∂φ_b/∂x_d  (P1: gradient constant)
        be = third[:, None, None] * np.broadcast_to(
            grads[:, None, :, d], (T, 3, 3)
        )
        vals = be.reshape(T, 9)
        out.append(
            sp.coo_matrix(
                (vals.ravel(), (rows.ravel(), cols.ravel())), shape=(M, M)
            ).tocsr()
        )
    return out[0], out[1]


def _assemble_mass_lumped(nodes, tris, area) -> np.ndarray:
    M = np.zeros(len(nodes))
    for a in range(3):
        np.add.at(M, tris[:, a], area / 3.0)
    return M


def _assemble_convection(nodes, tris, area, grads, u, v) -> sp.csr_matrix:
    """N(w)_ij = ∫ (w·∇φ_j) φ_i with w the current velocity (Picard).

    One-point quadrature at the centroid: w̄ = mean of nodal values.
    """
    T = len(tris)
    M = len(nodes)
    wu = u[tris].mean(axis=1)
    wv = v[tris].mean(axis=1)
    # (w̄ · ∇φ_b) is constant per triangle; ∫_T φ_a = area/3
    conv = wu[:, None] * grads[:, :, 0] + wv[:, None] * grads[:, :, 1]  # (T,3)
    ne = (area / 3.0)[:, None, None] * np.broadcast_to(
        conv[:, None, :], (T, 3, 3)
    )
    rows = np.repeat(tris, 3, axis=1).reshape(T, 9)
    cols = np.tile(tris, (1, 3)).reshape(T, 9)
    return sp.coo_matrix(
        (ne.reshape(T, 9).ravel(), (rows.ravel(), cols.ravel())),
        shape=(M, M),
    ).tocsr()


def boundary_nodes(tris: np.ndarray) -> np.ndarray:
    """Node indices on the mesh boundary (edges owned by one triangle)."""
    edges = np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
    )
    edges_sorted = np.sort(edges, axis=1)
    uniq, counts = np.unique(edges_sorted, axis=0, return_counts=True)
    bnd_edges = uniq[counts == 1]
    return np.unique(bnd_edges)


def solve_navier_stokes(
    nodes: np.ndarray,
    tris: np.ndarray,
    nu: float,
    dirichlet: Dict[int, Tuple[float, float]],
    alpha_stab: float = 0.05,
    picard_iters: int = 25,
    picard_tol: float = 1e-8,
    verbose: bool = False,
):
    """Steady incompressible NS; returns nodal (u, v, p).

    ``dirichlet``: {node_index: (u, v)}.  Non-Dirichlet boundary segments get
    the do-nothing outflow condition ν∂u/∂n − p n = 0 naturally.
    """
    M = len(nodes)
    area, grads = _triangle_geometry(nodes, tris)
    K = _assemble_stiffness(nodes, tris, area, grads)
    Bx, By = _assemble_divergence(nodes, tris, area, grads)
    # Brezzi–Pitkäranta: C = α Σ_T h_T² (∇p, ∇q)_T
    hT2 = 2.0 * area  # h_T² ≈ 2·area for roughly isotropic triangles
    T = len(tris)
    rows = np.repeat(tris, 3, axis=1).reshape(T, 9)
    cols = np.tile(tris, (1, 3)).reshape(T, 9)
    ce = (
        np.einsum("tad,tbd->tab", grads, grads)
        * (alpha_stab * hT2 * area)[:, None, None]
    )
    C = sp.coo_matrix(
        (ce.transpose(0, 2, 1).reshape(T, 9).ravel(), (rows.ravel(), cols.ravel())),
        shape=(M, M),
    ).tocsr()

    dir_idx = np.fromiter(dirichlet.keys(), dtype=np.int64)
    dir_u = np.array([dirichlet[i][0] for i in dir_idx])
    dir_v = np.array([dirichlet[i][1] for i in dir_idx])

    def apply_dirichlet(A: sp.csr_matrix, which: np.ndarray) -> sp.csr_matrix:
        A = A.tolil()
        A[which, :] = 0.0
        A[which, which] = 1.0
        return A.tocsr()

    u = np.zeros(M)
    v = np.zeros(M)
    u[dir_idx] = dir_u
    v[dir_idx] = dir_v
    p = np.zeros(M)

    n_u = M
    for it in range(picard_iters):
        N = _assemble_convection(nodes, tris, area, grads, u, v)
        A = nu * K + N
        # weak form: a(u,v) − (p, ∇·v) = 0 ; (∇·u, q) + α h²(∇p, ∇q) = 0
        # momentum pressure block: −(p, ∂φ_i/∂x_d) = −B(d)^T
        sys = sp.bmat(
            [
                [A, None, -Bx.T],
                [None, A, -By.T],
                [Bx, By, C],
            ],
            format="lil",
        )
        rhs = np.zeros(3 * M)
        # Dirichlet rows for u and v blocks
        sys_rows_u = dir_idx
        sys_rows_v = dir_idx + n_u
        for rows_set, vals in ((sys_rows_u, dir_u), (sys_rows_v, dir_v)):
            for r, val in zip(rows_set, vals):
                sys.rows[r] = [r]
                sys.data[r] = [1.0]
                rhs[r] = val
        sol = spla.spsolve(sys.tocsr(), rhs)
        u_new, v_new, p_new = sol[:M], sol[M : 2 * M], sol[2 * M :]
        du = max(
            np.max(np.abs(u_new - u)), np.max(np.abs(v_new - v))
        ) / max(1e-12, np.max(np.abs(u_new)))
        u, v, p = u_new, v_new, p_new
        if verbose:
            print(f"  picard {it}: rel delta {du:.2e}")
        if du < picard_tol:
            break
    return u, v, p
