"""Binding control bounds: swing-up under heavy saturation.

The reference enforces ``u in [-300, 300]`` as a retraction clamp
(``optimization.cc:319-328``); here the limit is squeezed to 30 N so the
clamp binds during the energy-pumping phase and the controller must plan
through the saturation (more swings, same upright endpoint).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    OptimizationParams,
    default_single_params,
    make_mpc,
    run_closed_loop,
)
from cartpole_tpu.ops.solver import NLSTerminationState

DOWN = np.array([0.0, -np.pi / 2, 0.0, 0.0])


class TestBindingControlBounds:
    def test_saturated_swingup(self):
        mpc = make_mpc(
            OptimizationParams(
                max_iterations=10, state_spacing=5, u_limit=30.0
            )
        )
        dp = default_single_params(jnp.float64)
        res = jax.jit(lambda x: run_closed_loop(mpc, x, dp, 400))(
            jnp.asarray(DOWN)
        )
        u = np.asarray(res.controls)
        assert np.all(np.abs(u) <= 30.0 + 1e-12)
        # The limit actually binds during the pump-up phase...
        assert (np.abs(u) > 30.0 - 1e-9).mean() > 0.02
        # ...and the pole still ends upright, solver healthy throughout.
        xf = np.asarray(res.final_state)
        assert abs(xf[1] - np.pi / 2) < 1e-4
        assert abs(xf[3]) < 1e-3
        term = np.asarray(res.termination_states)
        assert not np.any(
            (term == NLSTerminationState.QP_INDEFINITE)
            | (term == NLSTerminationState.MAX_LAMBDA)
        )
