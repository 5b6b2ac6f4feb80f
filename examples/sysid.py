"""System identification THROUGH the MPC controller — differentiable MPC demo.

Scenario: a plant whose mass/length differ from the controller's model.
We record what the controller actually does (its planned control windows)
on the true plant, then recover the true parameters by gradient descent on
the controller's own solve, using exact implicit-function-theorem
gradients (``cartpole_tpu.diff``) — no finite differences, no
differentiating through 8 unrolled Gauss-Newton iterations.

The reference stack cannot express this: its solver is an opaque C++/WASM
module (no gradients across ``Optimization::Step``,
``/root/reference/optimization/optimization.cc``). Here the solve is a
pure JAX function, so ``d(control plan)/d(model params)`` is one
``jax.grad`` away.

Run: python examples/sysid.py  (CPU, f64; ~2 min)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    MPCState,
    OptimizationParams,
    default_single_params,
    make_differentiable_solve,
    make_mpc,
)

FIT_FIELDS = ("m_1", "l_1")


def main():
    mpc = make_mpc(
        OptimizationParams(
            max_iterations=20,
            window_length=20,
            state_spacing=5,
            u_guess_sinusoid_amplitude=0.0,
        )
    )
    spec = mpc.spec
    dtype = jnp.float64

    true_dp = dataclasses.replace(
        default_single_params(dtype), m_1=0.16, l_1=0.31
    )
    print(f"true params:    m_1={true_dp.m_1:.4f}  l_1={true_dp.l_1:.4f}")

    # "Data": the plans the controller produces on the TRUE plant from a
    # handful of near-upright states (cold solves → deterministic data).
    cold = MPCState(
        previous_solution=jnp.zeros((spec.dim,), dtype),
        warm=jnp.zeros((), bool),
    )
    # Excitation matters: tip MASS is only identifiable from plans where
    # inertia does real work, so include fast-swinging states alongside
    # the near-upright ones (classic persistent-excitation requirement).
    rng = np.random.RandomState(3)
    xs = np.tile(np.array([0.0, np.pi / 2, 0.0, 0.0]), (8, 1))
    xs[:, 0] += rng.uniform(-0.3, 0.3, 8)
    xs[:, 1] += rng.uniform(-0.2, 0.2, 8)
    xs[:, 2] += rng.uniform(-1.0, 1.0, 8)
    xs[:, 3] += rng.uniform(-2.5, 2.5, 8)
    xs = jnp.asarray(xs, dtype)

    solve = make_differentiable_solve(mpc)

    def plans(dp):
        return jax.vmap(
            lambda x: solve(x, dp, 0.0, cold)[spec.u_start :]
        )(xs)

    u_data = jax.jit(plans)(true_dp)

    # Fit m_1, l_1 by gradient descent on the plan-matching loss. The
    # gradient flows through the full constrained solve via the KKT IFT.
    def loss_fn(v):
        dp = dataclasses.replace(
            default_single_params(dtype),
            **{f: v[i] for i, f in enumerate(FIT_FIELDS)},
        )
        return jnp.mean((plans(dp) - u_data) ** 2)

    import optax

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))
    v = jnp.array([0.10, 0.25], dtype)  # the library defaults (wrong plant)
    opt = optax.adam(5e-3)
    opt_state = opt.init(v)
    print(f"initial guess:  m_1={v[0]:.4f}  l_1={v[1]:.4f}")
    for i in range(120):
        val, g = value_and_grad(v)
        updates, opt_state = opt.update(g, opt_state)
        v = optax.apply_updates(v, updates)
        if i % 20 == 0 or i == 119:
            print(
                f"  step {i:3d}: loss {float(val):10.4e}  "
                f"m_1={float(v[0]):.4f}  l_1={float(v[1]):.4f}"
            )

    err = np.abs(np.asarray(v) - np.array([true_dp.m_1, true_dp.l_1]))
    print(f"recovered:      m_1={float(v[0]):.4f}  l_1={float(v[1]):.4f}  "
          f"(abs err {err[0]:.1e}, {err[1]:.1e})")
    assert err.max() < 5e-3, "sysid did not converge"
    print("OK")


if __name__ == "__main__":
    main()
