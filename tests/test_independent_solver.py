"""Independent solver cross-check (VERDICT r1 weak #4).

The native C++ oracle intentionally mirrors the semantics of
``ops/solver.py``, so closed-loop u-parity between them validates two
implementations of the SAME algorithm. This test closes the circularity: it
solves the very same constrained NLS windows with an ALGORITHMICALLY
DIFFERENT solver — scipy's SLSQP (sequential least-squares QP with BFGS
curvature, bound constraints, its own line search; nothing shared with the
batched Gauss-Newton) — and asserts the optimized control windows agree.

Interior (no binding clamp) stabilization problems are used so both
methods converge to the same KKT point; swing-up from hanging binds the
u-clamp, where a retraction-projected GN and a bound-constrained SQP
legitimately differ in the active-set corner handling.
"""

import jax
import jax.numpy as jnp
import numpy as np
from conftest import require_or_skip

require_or_skip("scipy.optimize")
import scipy.optimize  # noqa: E402

from cartpole_tpu import (
    OptimizationParams,
    default_single_params,
    make_mpc,
)

SEED = 11
N_CASES = 8


def _scipy_window_solve(mpc, x0, z0, dp):
    """Solve one MPC window with SLSQP on the identical NLS."""
    spec = mpc.spec
    zero = jnp.zeros((), jnp.float64)

    def cost(z):
        r = spec.cost_residuals(jnp.asarray(z), zero, zero)
        return 0.5 * jnp.vdot(r, r).real

    def cons(z):
        return spec.constraints(jnp.asarray(z), jnp.asarray(x0), zero, dp)

    cost_g = jax.jit(jax.grad(cost))
    cons_j = jax.jit(jax.jacrev(cons))
    cost_j = jax.jit(cost)
    cons_f = jax.jit(cons)

    p = mpc.params
    bounds = []
    for s in range(spec.num_states):
        for c in range(spec.state_dim):
            if c == 0:
                bounds.append((-p.b_x_limit, p.b_x_limit))
            else:
                bounds.append((None, None))
    bounds += [(-p.u_limit, p.u_limit)] * spec.window_length

    res = scipy.optimize.minimize(
        lambda z: float(cost_j(z)),
        np.asarray(z0),
        jac=lambda z: np.asarray(cost_g(z)),
        method="SLSQP",
        bounds=bounds,
        constraints={
            "type": "eq",
            "fun": lambda z: np.asarray(cons_f(z)),
            "jac": lambda z: np.asarray(cons_j(z)),
        },
        options={"maxiter": 200, "ftol": 1e-14},
    )
    assert res.success, res.message
    return res.x[spec.u_start:]


class TestIndependentSolver:
    def test_u_windows_match_slsqp(self):
        """Window solutions from ~8 interior states agree with SLSQP to
        <= 1e-3 max-abs in u (driver gate from VERDICT r1 item 8)."""
        mpc = make_mpc(
            OptimizationParams(
                max_iterations=40, state_spacing=5,
                relative_exit_tol=1e-12, kkt_method="condensed",
            )
        )
        dp = default_single_params(jnp.float64)
        rng = np.random.RandomState(SEED)
        step = jax.jit(mpc.step)

        worst = 0.0
        for _ in range(N_CASES):
            x0 = jnp.asarray([
                rng.uniform(-0.3, 0.3),
                np.pi / 2 + rng.uniform(-0.15, 0.15),
                rng.uniform(-0.3, 0.3),
                rng.uniform(-0.3, 0.3),
            ])
            out, _ = step(mpc.init_state(jnp.float64), x0, dp, 0.0)
            u_ours = np.asarray(out.u)
            # interior check: the clamp must not bind for a fair compare
            assert np.abs(u_ours).max() < mpc.params.u_limit - 1.0
            u_scipy = _scipy_window_solve(
                mpc, x0, np.asarray(out.previous_solution), dp
            )
            diff = np.abs(u_ours - u_scipy).max()
            worst = max(worst, diff)
        assert worst <= 1e-3, worst
