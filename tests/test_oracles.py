"""Oracle tests: cavity FD solver vs Ghia benchmark, FEM solver sanity,
gmsh reader, io round-trips."""

import numpy as np
import pytest

from tpinn.oracles import cavity, io


# Ghia, Ghia & Shin (1982), Re=100: u along the vertical centerline x=0.5
GHIA_RE100_Y = np.array(
    [0.0, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531, 0.5,
     0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 0.9766, 1.0]
)
GHIA_RE100_U = np.array(
    [0.0, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150, -0.15662,
     -0.21090, -0.20581, -0.13641, 0.00332, 0.23151, 0.68717, 0.73722,
     0.78871, 0.84123, 1.0]
)


@pytest.mark.slow
def test_cavity_steady_vs_ghia_re100():
    n = 64
    u, v, p = cavity.solve_cavity_steady(re=100.0, n=n, t_end=15.0)
    uu = u.reshape(n + 1, n + 1)
    ys = np.linspace(0, 1, n + 1)
    u_center = uu[:, n // 2]
    ui = np.interp(GHIA_RE100_Y, ys, u_center)
    # measured 0.0041 with the SOU scheme (round 2)
    assert np.max(np.abs(ui - GHIA_RE100_U)) < 0.008


GHIA_RE400_U = np.array(
    [0.0, -0.08186, -0.09266, -0.10338, -0.14612, -0.24299, -0.32726,
     -0.17119, -0.11477, 0.02135, 0.16256, 0.29093, 0.55892, 0.61756,
     0.68439, 0.75837, 1.0]
)


@pytest.mark.slow
def test_cavity_steady_vs_ghia_re400():
    """2nd-order upwind convection: measured 0.0039 at n=96 (round 2);
    the 1st-order scheme gave 0.034."""
    n = 96
    u, v, p = cavity.solve_cavity_steady(re=400.0, n=n, t_end=35.0)
    uu = u.reshape(n + 1, n + 1)
    ys = np.linspace(0, 1, n + 1)
    # Ghia's 17 sample y-locations are the same for every Re column
    ui = np.interp(GHIA_RE100_Y, ys, uu[:, n // 2])
    assert np.max(np.abs(ui - GHIA_RE400_U)) < 0.008


GHIA_RE1000_U = np.array(
    [0.0, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289, -0.27805,
     -0.10648, -0.06080, 0.05702, 0.18719, 0.33304, 0.46604, 0.51117,
     0.57492, 0.65928, 1.0]
)


@pytest.mark.slow
def test_cavity_steady_vs_ghia_re1000():
    """Measured 0.0063 at n=128 with the SOU scheme (round 2)."""
    n = 128
    u, v, p = cavity.solve_cavity_steady(re=1000.0, n=n, t_end=50.0)
    uu = u.reshape(n + 1, n + 1)
    ui = np.interp(GHIA_RE100_Y, np.linspace(0, 1, n + 1), uu[:, n // 2])
    assert np.max(np.abs(ui - GHIA_RE1000_U)) < 0.012


def test_cavity_pressure_not_accumulating():
    """Non-incremental Chorin regression: state pressure is the projection
    potential itself, so the steady-state pressure field must be independent
    of how long the solver marches (the p+phi accumulation bug made it grow
    linearly with step count and poisoned the committed example data)."""
    spreads = []
    for t_end in (3.0, 6.0):
        u, v, p = cavity.solve_cavity_steady(re=100.0, n=32, t_end=t_end)
        spreads.append(p.max() - p.min())
    # doubling the march length leaves the spread unchanged up to residual
    # transient decay (the p+phi accumulation bug made it DOUBLE)
    assert spreads[1] / spreads[0] < 1.05
    # nondimensional pressure is O(1), not O(steps)
    assert spreads[0] < 50.0


def test_cavity_unsteady_short_run():
    times, snaps = cavity.solve_cavity_unsteady(
        nu=1.0, lid_velocity=1.0, t_end=5e-4, dt_out=1e-4, n=32
    )
    assert len(snaps) == 5
    # t=0 snapshot is the zero field (reference writes w=0 at step 0)
    u0, v0, p0 = snaps[0]
    assert np.allclose(u0, 0.0) and np.allclose(v0, 0.0)
    # later snapshots develop lid-driven flow near the top
    u_last = snaps[-1][0].reshape(33, 33)
    assert u_last[-1].max() == pytest.approx(1.0)  # lid row
    assert np.abs(u_last[-5]).max() > 1e-4  # momentum diffused downward
    # divergence-free-ish interior
    assert np.isfinite(snaps[-1][2]).all()


def test_vertex_grid_ordering():
    x, y = cavity.vertex_grid(2)
    # x fastest (reference dom_grid order)
    np.testing.assert_allclose(x[:3], [0.0, 0.5, 1.0])
    np.testing.assert_allclose(y[:3], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(y[-1], 1.0)


def test_interpolate_vertex_field_exact_on_nodes():
    n = 4
    x, y = cavity.vertex_grid(n)
    f = 2.0 * x + 3.0 * y
    out = cavity.interpolate_vertex_field(f, n, x, y)
    np.testing.assert_allclose(out, f, atol=1e-12)


def test_h5_roundtrip(tmp_path):
    u = np.random.default_rng(0).normal(size=11)
    v = np.random.default_rng(1).normal(size=11)
    p = np.random.default_rng(2).normal(size=11)
    geo = np.random.default_rng(3).normal(size=(11, 2))
    path = tmp_path / "fields.h5"
    io.write_fields_h5(path, u, v, p, geometry=geo)
    u2, v2, p2 = io.read_fields_h5(path)
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_array_equal(io.read_mesh_geometry_h5(path), geo)


def test_random_csv_derived_from_cached_h5(tmp_path):
    # generate.py: when the steady h5 is cached but the random-5000-pt csv
    # is missing, the csv must be derived from the CACHED fields (not a
    # fresh solve), so all layouts stay mutually consistent
    from tpinn.oracles import generate

    n_out = 100
    xq, yq = cavity.vertex_grid(n_out)
    u = 2.0 * xq + yq
    v = xq - yq
    p = 3.0 * xq
    folder = tmp_path / "SteadyCase"
    io.write_fields_h5(folder / "navier-stokes_cavity_steady.h5", u, v, p,
                       geometry=np.stack([xq, yq], axis=-1))
    io.write_regular_csv(folder / "navier-stokes_cavity_steady_r.csv",
                         xq, yq, u, v, p)
    out = generate.generate_cavity_steady(str(tmp_path))
    csv = io.read_regular_csv(
        folder / "navier-stokes_cavity_steady.csv")
    assert out == str(folder)
    assert len(csv["x"]) == 5000
    # bilinear interpolation reproduces affine fields exactly
    np.testing.assert_allclose(csv["ux"], 2 * csv["x"] + csv["y"],
                               atol=1e-12)
    np.testing.assert_allclose(csv["p"], 3 * csv["x"], atol=1e-12)


def test_unsteady_series_roundtrip(tmp_path):
    snaps = [
        (np.full(5, i), np.full(5, -i), np.arange(5.0) + i) for i in range(3)
    ]
    io.write_unsteady_series_h5(tmp_path, snaps)
    u, v, p = io.read_unsteady_series_h5(tmp_path, 3)
    assert u.shape == (15,)
    np.testing.assert_array_equal(u[5:10], 1.0)
    # per-step pressure recentering (reference pres_h5 lambda)
    assert abs(p[:5].mean()) < 1e-12


def test_regular_csv_roundtrip(tmp_path):
    path = tmp_path / "grid_r.csv"
    io.write_regular_csv(path, [0, 1], [2, 3], [4, 5], [6, 7], [8, 9])
    data = io.read_regular_csv(path)
    assert list(data.keys()) == ["x", "y", "ux", "uy", "p"]
    np.testing.assert_array_equal(data["p"], [8, 9])


def test_bpoints_loader(tmp_path):
    arr = np.zeros((10, 4))
    arr[:, 0] = np.arange(10)
    arr[5:, 3] = 1  # INF flag
    path = tmp_path / "bpoints.npy"
    np.save(path, arr)
    bp = io.load_bpoints(path)
    assert bp["NOSL"].shape == (5, 2)
    assert bp["INF"].shape == (5, 2)
    assert bp["OUT1"].shape == (0, 2)


def test_fem_poiseuille_channel():
    """P1 solver sanity: pressure-driven Stokes channel flow on a structured
    triangulated rectangle reproduces the parabolic profile."""
    from tpinn.oracles import fem

    nx, ny = 24, 12
    xs = np.linspace(0, 2, nx + 1)
    ys = np.linspace(0, 1, ny + 1)
    xx, yy = np.meshgrid(xs, ys)
    nodes = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)

    def vid(i, j):
        return j * (nx + 1) + i

    tris = []
    for j in range(ny):
        for i in range(nx):
            tris.append([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)])
            tris.append([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)])
    tris = np.asarray(tris)

    u_profile = lambda y: 4.0 * y * (1.0 - y)  # peak 1 at centerline
    dirichlet = {}
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = nodes[vid(i, j)]
            if y < 1e-12 or y > 1 - 1e-12:
                dirichlet[vid(i, j)] = (0.0, 0.0)
            elif x < 1e-12:
                dirichlet[vid(i, j)] = (u_profile(y), 0.0)
            # outflow x=2: do-nothing

    u, v, p = fem.solve_navier_stokes(
        nodes, tris, nu=1.0, dirichlet=dirichlet, picard_iters=4
    )
    # mid-channel profile matches the inflow parabola
    mid = [vid(nx // 2, j) for j in range(ny + 1)]
    expect = u_profile(nodes[mid][:, 1])
    assert np.max(np.abs(u[mid] - expect)) < 0.05
    assert np.max(np.abs(v)) < 0.05
    # pressure decreases downstream
    assert p[vid(2, ny // 2)] > p[vid(nx - 2, ny // 2)]


def test_gmsh_reader_reference_mesh():
    import os

    path = "/root/reference/Examples/Coronary_Flow/coroParam.msh"
    if not os.path.exists(path):
        pytest.skip("reference mesh not available")
    from tpinn.oracles.mesh import read_gmsh

    mesh = read_gmsh(path)
    assert mesh.nodes.shape[0] == 10833
    assert mesh.triangles.shape[0] > 20000
    assert mesh.triangles.max() < mesh.nodes.shape[0]
    # domain bounding box from the .geo design
    assert -1.6 < mesh.nodes[:, 0].min() < -1.4
    assert 1.9 < mesh.nodes[:, 0].max() < 2.1


def test_refine_uniform_preserves_geometry():
    from tpinn.oracles.coronary import boundary_vertices_of, refine_uniform

    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    n2, t2 = refine_uniform(nodes, tris)
    assert t2.shape == (8, 3)
    # original vertices keep their indices
    np.testing.assert_array_equal(n2[:4], nodes)
    # midpoints shared between adjacent triangles are not duplicated:
    # 4 original + 5 unique edge midpoints
    assert n2.shape == (9, 2)
    # total area preserved
    def area(n, t):
        a, b, c = n[t[:, 0]], n[t[:, 1]], n[t[:, 2]]
        return np.abs(np.cross(b - a, c - a)).sum() / 2
    assert area(n2, t2) == pytest.approx(area(nodes, tris))
    # boundary of the refined unit square: all nodes except the center
    bnd = boundary_vertices_of(t2)
    assert len(bnd) == 8


def test_classify_boundary_matches_generate_bpoints():
    import os

    path = "/root/reference/Examples/Coronary_Flow/coroParam.msh"
    if not os.path.exists(path):
        pytest.skip("reference mesh not available")
    from tpinn.oracles.coronary import (
        boundary_vertices_of, classify_boundary, generate_bpoints,
    )
    from tpinn.oracles.mesh import read_gmsh

    mesh = read_gmsh(path)
    bidx = boundary_vertices_of(mesh.triangles)
    marks = classify_boundary(mesh.nodes[:, :2], bidx)
    ref = generate_bpoints(path)
    # same split as the npy-based marking: 701/33/33/33
    assert [int((marks == f).sum()) for f in range(4)] == [701, 33, 33, 33]


def test_generate_emits_xdmf_wrappers(tmp_path):
    # the generate pipeline writes .xdmf wrappers next to every fields h5
    # (reference fluid_solver_steady.py:94-102, fluid_solver_unsteady.py:86-95)
    from tpinn.oracles import generate

    n_out = 100
    xq, yq = cavity.vertex_grid(n_out)
    u = xq + yq
    folder = tmp_path / "SteadyCase"
    io.write_fields_h5(folder / "navier-stokes_cavity_steady.h5", u, u, u,
                       geometry=np.stack([xq, yq], axis=-1))
    io.write_regular_csv(folder / "navier-stokes_cavity_steady_r.csv",
                         xq, yq, u, u, u)
    generate.generate_cavity_steady(str(tmp_path))
    xdmf = folder / "navier-stokes_cavity_steady.xdmf"
    assert xdmf.exists()
    text = xdmf.read_text()
    assert f'Dimensions="{(n_out + 1) ** 2} 2"' in text
    assert "navier-stokes_cavity_steady.h5:/VisualisationVector/0" in text

    # unsteady cached path: wrapper per timestep h5
    T, dt = 1e-2, 1e-4
    n_times = int(round(T / dt))
    ufolder = tmp_path / "UnsteadyCase"
    snaps = [(np.full(9, i), np.full(9, -i), np.arange(9.0))
             for i in range(n_times)]
    io.write_unsteady_series_h5(ufolder, snaps)
    (ufolder / "navier-stokes_SI_cavity_unsteady_r.csv").write_text("x\n")
    generate.generate_cavity_unsteady(str(tmp_path), T=T, dt=dt)
    w0 = ufolder / "navier-stokes_SI_cavity_unsteady_00000.xdmf"
    w_last = ufolder / f"navier-stokes_SI_cavity_unsteady_{n_times-1:05d}.xdmf"
    assert w0.exists() and w_last.exists()
    assert 'Dimensions="9 2"' in w0.read_text()


def _channel_mesh(nx=16, ny=8, L=2.0, H=1.0):
    xs = np.linspace(0, L, nx + 1)
    ys = np.linspace(0, H, ny + 1)
    xx, yy = np.meshgrid(xs, ys)
    nodes = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)

    def vid(i, j):
        return j * (nx + 1) + i

    tris = []
    for j in range(ny):
        for i in range(nx):
            tris.append([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)])
            tris.append([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)])
    return nodes, np.asarray(tris), vid


def test_fem_unsteady_semi_implicit_channel():
    """Semi-implicit unsteady solver (reference navier-stokes_SI formulation,
    DataGeneration/coronary.py:110-130): impulsively-started channel flow
    develops toward the steady parabolic profile, with the (p/ν)(n·v)
    pressure surface term on the outflow."""
    from tpinn.oracles import fem

    nx, ny = 16, 8
    nodes, tris, vid = _channel_mesh(nx, ny)
    u_profile = lambda y: 4.0 * y * (1.0 - y)
    dirichlet = {}
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = nodes[vid(i, j)]
            if y < 1e-12 or y > 1 - 1e-12:
                dirichlet[vid(i, j)] = (0.0, 0.0)
            elif x < 1e-12:
                dirichlet[vid(i, j)] = (u_profile(y), 0.0)

    edges, _, _ = fem.boundary_edges_with_normals(nodes, tris)
    out_sel = (nodes[edges[:, 0], 0] > 2.0 - 1e-12) & (
        nodes[edges[:, 1], 0] > 2.0 - 1e-12)
    # nu=2 (NOT 1): at nu=1 the reference's (p/nu) n.v surface term exactly
    # cancels the natural -p n.v outflow flux and the constant-pressure mode
    # becomes a nullspace (see solve_navier_stokes_unsteady docstring)
    times, snaps = fem.solve_navier_stokes_unsteady(
        nodes, tris, nu=2.0, dirichlet=dirichlet,
        t_end=0.5, dt=0.05, pressure_outflow_edges=edges[out_sel],
    )
    assert len(snaps) == len(times) == 10
    u0, _, _ = snaps[0]
    uT, vT, pT = snaps[-1]
    assert np.all(u0 == 0.0)                      # impulsive start
    assert np.all(np.isfinite(uT)) and np.all(np.isfinite(pT))
    # flow developed: mid-channel profile heads toward the parabola
    mid = [vid(nx // 2, j) for j in range(ny + 1)]
    expect = u_profile(nodes[mid][:, 1])
    assert np.max(np.abs(uT[mid] - expect)) < 0.15
    assert np.max(np.abs(vT)) < 0.1
    # monotone development (velocity grows from rest)
    u_mid_t = [s[0][vid(nx // 2, ny // 2)] for s in snaps]
    assert u_mid_t[1] < u_mid_t[3] < u_mid_t[-1] + 1e-12


def test_boundary_edge_normals_outward():
    from tpinn.oracles import fem

    nodes, tris, _ = _channel_mesh(4, 2)
    edges, normals, lengths = fem.boundary_edges_with_normals(nodes, tris)
    mids = 0.5 * (nodes[edges[:, 0]] + nodes[edges[:, 1]])
    center = np.array([1.0, 0.5])
    # outward: normal points away from the rectangle center
    assert np.all(np.einsum("ed,ed->e", normals, mids - center) > 0)
    assert np.allclose(np.linalg.norm(normals, axis=1), 1.0)
    # total boundary length of the 2x1 rectangle
    assert abs(lengths.sum() - 6.0) < 1e-12


@pytest.mark.slow
def test_coronary_unsteady_oracle_smoke(tmp_path):
    """Unsteady coronary path on the real gmsh mesh: 3 semi-implicit steps
    produce finite, flowing fields and the generate wrapper writes the
    reference's per-step h5 + xdmf + bpoints layout
    (DataGeneration/coronary.py:95-104,64-66)."""
    import os

    from tpinn.oracles import coronary as coro

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    msh = os.path.join(root, "examples", "Coronary_Flow", "coroParam.msh")
    folder = coro.generate_coronary_unsteady(
        str(tmp_path), msh, t_end=3e-4, dt=1e-4)
    for it in range(3):
        h5 = io.unsteady_h5_path(folder, it, formulation="navier-stokes_SI",
                                 testcase="coronary")
        assert os.path.exists(h5)
        assert os.path.exists(os.path.splitext(h5)[0] + ".xdmf")
    assert os.path.exists(os.path.join(folder, "bpoints.npy"))
    u, v, p = io.read_fields_h5(
        io.unsteady_h5_path(folder, 2, formulation="navier-stokes_SI",
                            testcase="coronary"))
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(p))
    assert np.max(np.abs(u)) > 0.1  # inflow has set the fluid moving


def test_fem_stokes_linear_solve():
    """Stokes formulation option (reference fluid_solver_steady.py:64-72):
    the pressure-driven channel is an exact Stokes solution, and on a
    lid-driven problem the linear solve must differ from the NS one."""
    from tpinn.oracles import fem

    nx, ny = 16, 8
    nodes, tris, vid = _channel_mesh(nx, ny)
    u_profile = lambda y: 4.0 * y * (1.0 - y)
    dirichlet = {}
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = nodes[vid(i, j)]
            if y < 1e-12 or y > 1 - 1e-12:
                dirichlet[vid(i, j)] = (0.0, 0.0)
            elif x < 1e-12:
                dirichlet[vid(i, j)] = (u_profile(y), 0.0)
    u, v, p = fem.solve_stokes(nodes, tris, nu=1.0, dirichlet=dirichlet)
    mid = [vid(nx // 2, j) for j in range(ny + 1)]
    assert np.max(np.abs(u[mid] - u_profile(nodes[mid][:, 1]))) < 0.05
    assert np.max(np.abs(v)) < 0.05

    # convection matters at Re>0 with a lid: Stokes != NS
    lid = {}
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = nodes[vid(i, j)]
            if y > 1 - 1e-12:
                lid[vid(i, j)] = (1.0, 0.0)
            elif y < 1e-12 or x < 1e-12 or x > 2 - 1e-12:
                lid[vid(i, j)] = (0.0, 0.0)
    us, _, _ = fem.solve_stokes(nodes, tris, nu=0.02, dirichlet=lid)
    un, _, _ = fem.solve_navier_stokes(nodes, tris, nu=0.02, dirichlet=lid,
                                       picard_iters=12)
    assert np.max(np.abs(us - un)) > 1e-3


def test_fem_unsteady_formulations():
    """The reference's three unsteady formulations
    (fluid_solver_unsteady.py:110-150): stokes drops convection, implicit
    converges the convection per step — at low Re all three land near the
    same developed channel flow, and implicit == semi-implicit to O(dt)."""
    from tpinn.oracles import fem

    nx, ny = 12, 6
    nodes, tris, vid = _channel_mesh(nx, ny)
    u_profile = lambda y: 4.0 * y * (1.0 - y)
    dirichlet = {}
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = nodes[vid(i, j)]
            if y < 1e-12 or y > 1 - 1e-12:
                dirichlet[vid(i, j)] = (0.0, 0.0)
            elif x < 1e-12:
                dirichlet[vid(i, j)] = (u_profile(y), 0.0)

    outs = {}
    for form in ("stokes", "navier-stokes_SI", "navier-stokes_I"):
        _, snaps = fem.solve_navier_stokes_unsteady(
            nodes, tris, nu=2.0, dirichlet=dirichlet, t_end=0.3, dt=0.05,
            formulation=form)
        outs[form] = snaps[-1][0]
    mid = [vid(nx // 2, j) for j in range(ny + 1)]
    for form, u in outs.items():
        assert np.all(np.isfinite(u)), form
        assert np.max(np.abs(u[mid] - u_profile(nodes[mid][:, 1]))) < 0.2, form
    # implicit and semi-implicit agree closely at this Re/dt
    assert np.max(np.abs(outs["navier-stokes_I"]
                         - outs["navier-stokes_SI"])) < 0.05

    with pytest.raises(ValueError):
        fem.solve_navier_stokes_unsteady(
            nodes, tris, nu=2.0, dirichlet=dirichlet, t_end=0.1, dt=0.05,
            formulation="nope")
