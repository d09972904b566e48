import os

import numpy as np

from tpinn import experiment, viz


def test_approx_scale_matches_reference_rounding():
    # reference poiseuille_flow.py:311-315: round outward to 5*10^k grid
    assert viz.approx_scale(0.123, True) == 0.15
    assert viz.approx_scale(0.123, False) == 0.1
    assert viz.approx_scale(-0.123, False) == -0.15
    assert viz.approx_scale(0.0, True) == 0.0
    assert viz.approx_scale(973.0, True) == 1000.0


def test_shared_levels_span_both_fields():
    ex = np.array([[0.0, 1.0]])
    pinn = np.array([[-0.2, 0.8]])
    lv = viz.shared_levels(ex, pinn, num_levels=11)
    assert len(lv) == 11
    assert lv[0] <= -0.2 and lv[-1] >= 1.0


def test_experiment_folder_autonumbering(tmp_path):
    f1 = experiment.prepare_folder(str(tmp_path), save_results=True)
    f2 = experiment.prepare_folder(str(tmp_path), save_results=True)
    assert os.path.basename(f1) == "Test_Case_#001"
    assert os.path.basename(f2) == "Test_Case_#002"
    scratch = experiment.prepare_folder(str(tmp_path), save_results=False)
    assert os.path.basename(scratch) == "Last_Training"
    # scratch reuse does not raise
    experiment.prepare_folder(str(tmp_path), save_results=False)


def test_recap_format(tmp_path):
    path = experiment.write_recap(
        str(tmp_path), "Poiseuille_Flow", 10000,
        {"PDE": 1000, "BC": 100, "IC": 100, "Vel": 10, "Pres": 0, "Test": 1000},
        noise_fit=0.0, noise_bnd=0.01, echo=False,
    )
    text = open(path).read()
    # reference Test_Options.txt line formats (poiseuille_flow.py:389-398)
    assert "Problem Name    -> Poiseuille_Flow" in text
    assert "Training Epochs -> 10000 epochs" in text
    assert "Pyhsical PDE Losses  -> 1000 points" in text
    assert "Noise on Boundary -> 0.01 times a gaussian N(0,1)" in text
    assert "Fitting Pressure  -> 0 points" in text


def test_xdmf_writer(tmp_path):
    from tpinn.oracles import io

    path = tmp_path / "fields.xdmf"
    io.write_xdmf(path, "fields.h5", 101)
    text = path.read_text()
    assert "VisualisationVector/0" in text
    assert 'Dimensions="101 2"' in text
