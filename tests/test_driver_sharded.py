"""StandardNSDriver with a device mesh: sharded losses == unsharded losses."""

import jax
import pytest

from tpinn import sharding
from tpinn.config import SimulationOptions
from tpinn.driver import CaseSpec, StandardNSDriver
from tpinn.oracles import analytic
from tpinn.pipeline import NSPhysics


def _spec():
    prm = analytic.PoiseuilleParams()
    return CaseSpec(
        name="Poiseuille_Sharded",
        extents=[(0.0, 1.0), (0.0, 0.1)],
        grid_shape=(20, 10),
        physics=NSPhysics(conv=prm.rho, visc=prm.mu),
        exact=(
            lambda x: analytic.poiseuille_u(x, prm),
            lambda x: analytic.poiseuille_v(x, prm),
            lambda x: analytic.poiseuille_p(x, prm),
        ),
        bnd_val={
            0: {"BOT": 0.0, "TOP": 0.0,
                "SX": lambda x: analytic.poiseuille_u(x, prm)},
            1: {"BOT": 0.0, "TOP": 0.0, "SX": 0.0},
        },
        weights={"PDE_MASS": 1e1},
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_driver_matches_unsharded():
    opts = SimulationOptions(
        epochs=0, n_pde=64, n_bc=16, n_vel=8, n_pres=0, n_test=32
    )
    mesh = sharding.point_mesh()

    plain = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                             second_round="none")
    shard = StandardNSDriver(_spec(), opts, save_results=False, seed=0,
                             second_round="none", mesh=mesh)

    import tpinn

    pb_a = tpinn.OptimizationProblem(plain.model.variables, plain.losses,
                                     plain.losses_test)
    pb_b = tpinn.OptimizationProblem(shard.model.variables, shard.losses,
                                     shard.losses_test)
    la, _, _ = jax.device_get(pb_a.eval_jit()(plain.model.params))
    lb, _, _ = jax.device_get(pb_b.eval_jit()(shard.model.params))
    assert abs(float(la) - float(lb)) < 1e-10 * max(1.0, abs(float(la)))
