import jax
import jax.numpy as jnp
import numpy as np

from tpinn import geometry


def test_tensor_grid_reference_ordering():
    # reference: [(i, j) for j in y_vec for i in x_vec]  (x fastest)
    x = jnp.array([0.0, 1.0, 2.0])
    y = jnp.array([10.0, 20.0])
    grid = geometry.tensor_grid(x, y)
    expect = np.array([(i, j) for j in [10.0, 20.0] for i in [0.0, 1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(grid), expect)


def test_space_time_grid_ordering():
    # reference: [(t, i, j) for t in time for j in y for i in x]
    t = jnp.array([0.0, 0.5])
    x = jnp.array([1.0, 2.0])
    y = jnp.array([5.0, 6.0])
    grid = geometry.space_time_grid(t, x, y)
    expect = np.array(
        [(tt, i, j) for tt in [0.0, 0.5] for j in [5.0, 6.0] for i in [1.0, 2.0]]
    )
    np.testing.assert_array_equal(np.asarray(grid), expect)


def test_split_indices_disjoint(key):
    counts = {"PDE": 50, "Vel": 10, "Pres": 1, "Test": 30}
    idx = geometry.split_indices(key, 200, counts)
    all_idx = np.concatenate([idx[k] for k in counts])
    assert len(all_idx) == 91
    assert len(np.unique(all_idx)) == 91
    assert all(len(idx[k]) == counts[k] for k in counts)
    assert all_idx.max() < 200


def test_rect_boundary_points_on_edges(key):
    ext = [(0.0, 1.0), (0.0, 0.1)]
    bnd = geometry.rect_boundary_points(key, ext, 32)
    assert set(bnd.keys()) == {"BOT", "DX", "TOP", "SX"}
    np.testing.assert_allclose(np.asarray(bnd["BOT"][:, 1]), 0.0)
    np.testing.assert_allclose(np.asarray(bnd["TOP"][:, 1]), 0.1)
    np.testing.assert_allclose(np.asarray(bnd["SX"][:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(bnd["DX"][:, 0]), 1.0)
    assert np.all(np.asarray(bnd["BOT"][:, 0]) <= 1.0)


def test_rect_boundary_points_spacetime(key):
    ext = [(0.0, 1.0), (0.0, 1.0)]
    bnd = geometry.rect_boundary_points(key, ext, 16, time_horizon=0.01)
    assert bnd["TOP"].shape == (16, 3)
    assert np.all(np.asarray(bnd["TOP"][:, 0]) <= 0.01)
    np.testing.assert_allclose(np.asarray(bnd["TOP"][:, 2]), 1.0)


def test_initial_condition_points(key):
    pts = geometry.initial_condition_points(key, [(0.0, 1.0), (0.0, 1.0)], 8)
    np.testing.assert_allclose(np.asarray(pts[:, 0]), 0.0)


def test_generate_noise_scaling(key):
    noise = geometry.generate_noise(key, 10000, factor=0.01)
    assert abs(float(jnp.std(noise)) - 0.01) < 0.002
    zero = geometry.generate_noise(key, 100, factor=0.0)
    np.testing.assert_array_equal(np.asarray(zero), 0.0)


def test_normalization_spread():
    u = np.array([0.0, 2.0])
    v = np.array([0.0, 1.0])
    p = np.array([-3.0, 5.0])
    norm = geometry.Normalization(u, v, p)
    assert norm.norm_vel == 2.0
    assert norm.norm_pre == 8.0
    assert norm.residual_scale == 1.0 / 8.0
