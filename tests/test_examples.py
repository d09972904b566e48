"""Example-driver smoke tests (tiny epoch counts, scratch folders)."""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_example(rel_path):
    name = os.path.splitext(os.path.basename(rel_path))[0]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, rel_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_poisson_example_smoke(tmp_path):
    mod = load_example("examples/Poisson_Problem/poisson.py")
    pb, model = mod.main(epochs=40, save_plots=False, out_dir=str(tmp_path),
                         second_round="jax")
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]
    assert (tmp_path / "Images" / "Poisson_history_loss.json").exists()


@pytest.mark.slow
def test_poiseuille_example_smoke(tmp_path):
    mod = load_example("examples/Poiseuille_Flow/poiseuille_flow.py")
    driver = mod.main(epochs=40, save_results=True, base_dir=str(tmp_path),
                      second_round="jax")
    finals = driver.final_test_losses()
    assert set(finals) == {"u_test", "v_test", "p_test"}
    folder = driver.folder
    assert os.path.exists(os.path.join(folder, "History_Loss.json"))
    assert os.path.exists(os.path.join(folder, "Graphic.jpg"))


@pytest.mark.slow
def test_poiseuille_no_pressure_smoke(tmp_path):
    mod = load_example("examples/Poiseuille_Flow/poiseuille_no_pressure.py")
    pb, model = mod.main(epochs=30, out_dir=str(tmp_path), second_round="jax")
    assert "u_test" in pb.history.losses_test
    # velocity-only head: 2 outputs
    assert model.layer_sizes[-1] == 2


@pytest.mark.slow
def test_poiseuille_adimensional_smoke(tmp_path):
    # old nisaba-script API style: create_rhs, normalization=1e4 PDE losses
    mod = load_example("examples/Poiseuille_Flow/poiseuille_adimensional.py")
    pb, model = mod.main(epochs=30, save_plots=False, out_dir=str(tmp_path),
                         second_round="jax")
    d = pb.history.to_dict()
    assert d["losses"]["PDE_MASS"]["weight"] == 1.0
    assert "BCN_x1_u" in d["losses"] and "exact_p" in d["losses"]
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]
    # the consistent adimensionalization: the exact solution must satisfy
    # momentum-x, (1/Re)*u_yy == p_x (convection and v vanish identically) —
    # checked with a central second difference of u_exact
    import numpy as np

    h = 1e-4
    y = np.array([0.3, 0.5, 0.7]) * mod.H
    pts = lambda yy: np.stack([0.5 * np.ones_like(yy), yy], axis=1)
    u = lambda yy: np.asarray(mod.u_exact(pts(yy)))
    u_yy = (u(y + h) - 2 * u(y) + u(y - h)) / h**2
    p_x = mod.P_X
    assert np.allclose(u_yy / mod.RE, p_x, rtol=1e-5)


@pytest.mark.slow
def test_cavity_steady_csv_smoke(tmp_path):
    # old nisaba-script API style: CSV positional slices, 32/32/64 arch,
    # press_mode switch, Saved_Model save/load round-trip
    mod = load_example("examples/Cavity_Steady/cavity_steady_csv.py")
    pb, model = mod.main(epochs=20, save_plots=False, out_dir=str(tmp_path),
                         second_round="jax", press_mode="Mean",
                         save_mode=True, model_name_save="smoke")
    d = pb.history.to_dict()
    assert d["losses"]["PDE_MASS"]["weight"] == 1e-2
    assert "MEAN_p" in d["losses"] and "COL_p" not in d["losses"]
    assert model.layer_sizes == (2, 32, 32, 64, 3)
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]
    # load_mode: reload the saved Keras-layout files (reference :272-279)
    pb2, model2 = mod.main(load_mode=True, model_name_load="smoke",
                           save_plots=False, out_dir=str(tmp_path))
    import numpy as np

    assert model2.layer_sizes == (2, 32, 32, 64, 3)
    a = np.asarray(model.params[0]["kernel"])
    b = np.asarray(model2.params[0]["kernel"])
    assert np.allclose(a, b)


@pytest.mark.slow
def test_cavity_unsteady_old_smoke(tmp_path):
    # old nisaba-script API style: random.sample space-time subsets, CI_p
    # initial-pressure pin, per-group enable flags, mixed normalizations
    mod = load_example("examples/Cavity_Unsteady/cavity_unsteady_old.py")
    pb, model = mod.main(epochs=15, second_round="jax", save_plots=False,
                         out_dir=str(tmp_path), num_PDE=300, num_BC=60,
                         num_CI=100, num_col=60, num_pres=60, num_test=200)
    d = pb.history.to_dict()
    assert d["losses"]["PDE_MASS"]["weight"] == 1e-2
    assert "CI_p" in d["losses"] and "COL_p" in d["losses"]
    assert model.layer_sizes == (3, 32, 32, 32, 3)
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]


@pytest.mark.slow
def test_colliding_pressmean_smoke(tmp_path):
    mod = load_example("examples/Colliding_Flow/colliding_flow_pressmean.py")
    pb, model = mod.main(epochs=30, out_dir=str(tmp_path), second_round="jax")
    # generic ns.Loss gauge present with its metadata
    d = pb.history.to_dict()
    assert "PRESS_0" in d["losses"]
    assert d["losses"]["PRESS_0"]["non_negative"] is True
    assert d["losses"]["PRESS_0"]["display_sqrt"] is False


@pytest.mark.slow
def test_poisson_misto_example_smoke(tmp_path):
    # mixed Dirichlet/Neumann variant; also exercises the fused-PDE gating
    # branch added in round 4 (fused off on CPU, jet path preserved)
    mod = load_example("examples/Poisson_Problem/poisson_misto.py")
    pb, model = mod.main(epochs=40, save_plots=False, out_dir=str(tmp_path),
                         second_round="jax")
    assert pb.history.loss_global[-1] < pb.history.loss_global[0]
    assert {"PDE", "BC_D", "BC_N"} <= set(pb.history.to_dict()["losses"])
