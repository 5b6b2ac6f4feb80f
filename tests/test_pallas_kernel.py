"""Pallas fused segment-Jacobian kernel — interpret-mode correctness.

The kernel (ops/pallas_kernels.py) computes the segment rollout and its
Jacobians batch-last with unrolled component arithmetic. On the current
single-chip tunnel the Mosaic compile of large kernels hangs (trivial
kernels compile in ~1s; `grid=`/large bodies never return), so the kernel
is exercised in interpreter mode here and kept off the default hot path;
see ops/pallas_kernels.py for the runtime notes.
"""

import jax.numpy as jnp
import numpy as np

from cartpole_tpu.models import SINGLE_CARTPOLE, _single_gen, default_single_params
from cartpole_tpu.ops.integrate import segment_rollout_with_jac
from cartpole_tpu.ops.pallas_kernels import segment_jac_batch_last


class TestPallasSegmentJac:
    def test_matches_chain_rule(self):
        dp = default_single_params(jnp.float64)
        m = SINGLE_CARTPOLE
        sd, sp, R = 4, 5, 256
        rng = np.random.RandomState(0)
        xs = jnp.asarray(rng.uniform(-1, 1, (sd, R)))
        us = jnp.asarray(rng.uniform(-10, 10, (sp, R)))
        pt = np.array([
            dp.m_b, dp.m_1, dp.l_1, dp.g, dp.mu_b,
            dp.v_mu_b, dp.c_d_1, dp.x_s, dp.k_s,
        ])
        pcols = jnp.asarray(np.broadcast_to(pt[:, None], (9, R)))

        xe, Jx, Ju = segment_jac_batch_last(
            _single_gen.single_dynamics_jac, pcols, xs, us, 0.01,
            m.angle_indices, interpret=True,
        )

        fj = lambda x, u: m.dynamics_jac(dp, x, u)
        for r in range(0, R, 37):
            xe_r, Jx_r, Ju_r = segment_rollout_with_jac(
                fj, xs[:, r], us[:, r], 0.01, m.angle_indices
            )
            np.testing.assert_allclose(
                np.asarray(xe[:, r]), np.asarray(xe_r), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(Jx[:, :, r]), np.asarray(Jx_r), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(Ju[:, :, r]), np.asarray(Ju_r), atol=1e-12
            )

    def test_rest_state_finite(self):
        """The where-guarded drag Jacobians stay finite at |v| = 0 inside
        the kernel too."""
        dp = default_single_params(jnp.float64)
        m = SINGLE_CARTPOLE
        R = 128
        xs = jnp.zeros((4, R)).at[1].set(-np.pi / 2)
        us = jnp.zeros((5, R))
        pt = np.array([
            dp.m_b, dp.m_1, dp.l_1, dp.g, dp.mu_b,
            dp.v_mu_b, dp.c_d_1, dp.x_s, dp.k_s,
        ])
        pcols = jnp.asarray(np.broadcast_to(pt[:, None], (9, R)))
        xe, Jx, Ju = segment_jac_batch_last(
            _single_gen.single_dynamics_jac, pcols, xs, us, 0.01,
            m.angle_indices, interpret=True,
        )
        for a in (xe, Jx, Ju):
            assert bool(jnp.all(jnp.isfinite(a)))
