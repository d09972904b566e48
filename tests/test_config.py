import jax.numpy as jnp

from tpinn import config


def test_default_dtype_is_float64_under_x64():
    assert config.get_dtype() == jnp.float64


def test_dtype_override_roundtrip():
    config.set_dtype(jnp.float32)
    try:
        assert config.get_dtype() == jnp.float32
    finally:
        config.set_dtype(None)
    assert config.get_dtype() == jnp.float64


def test_simulation_options_reference_format(tmp_path):
    # Byte-layout of the reference file
    # (Examples/Poiseuille_Flow/simulation_options.txt).
    text = (
        "### Put this file into the folder of the given problem ###\n"
        "TRAINING EPOCHS\n10000\n"
        "NOISE ON FITTING\n0\n"
        "NOISE ON BOUNDARY\n0.01\n"
        "POINTS PDE\n1000\n"
        "POINTS BOUNDARY CONDITIONS\n100\n"
        "POINTS INITIAL CONDITIONS\n100\n"
        "POINTS VELOCITY FITTING\n10\n"
        "POINTS PRESSURE FITTING\n0\n"
        "POINT TEST EVALUATION\n1000\n"
        "### End of the File ###"
    )
    p = tmp_path / "simulation_options.txt"
    p.write_text(text)
    opts = config.SimulationOptions.from_file(p)
    assert opts.epochs == 10000
    assert opts.noise_bnd == 0.01
    assert opts.n_pde == 1000 and opts.n_test == 1000
    assert opts.n_pres == 0
    assert opts.fit_velocity and not opts.fit_pressure
    assert opts.n_pts["PDE"] == 1000

    # round-trip through to_file
    q = tmp_path / "rt.txt"
    opts.to_file(q)
    opts2 = config.SimulationOptions.from_file(q)
    assert opts2 == opts
