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
def test_colliding_pressmean_smoke(tmp_path):
    mod = load_example("examples/Colliding_Flow/colliding_flow_pressmean.py")
    pb, model = mod.main(epochs=30, out_dir=str(tmp_path), second_round="jax")
    # generic ns.Loss gauge present with its metadata
    d = pb.history.to_dict()
    assert "PRESS_0" in d["losses"]
    assert d["losses"]["PRESS_0"]["non_negative"] is True
    assert d["losses"]["PRESS_0"]["display_sqrt"] is False
