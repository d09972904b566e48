"""Numerical/analytic oracles replacing the reference's offline FEniCS stage.

The reference generates "exact" data with FEniCS-in-Docker FEM solvers
(DataGeneration/fluid_solver_{steady,unsteady}.py, coronary.py — SURVEY.md
§3.4) whose outputs are gitignored and absent.  This package re-provides:

* analytic — closed-form solutions (Poisson, Poiseuille, colliding flow);
* cavity — a JAX-native finite-difference Navier–Stokes solver (steady via
  pseudo-time, unsteady time-accurate) for the lid-driven cavity;
* mesh — gmsh 4.1 ASCII reader (coroParam.msh) + bpoints.npy loader;
* io — readers/writers for the reference's h5/csv artifact layouts;
* coronary — Brinkman-penalized Cartesian solve of the stenosed-artery flow
  interpolated onto the gmsh mesh nodes.
"""

from tpinn.oracles import analytic  # noqa: F401
