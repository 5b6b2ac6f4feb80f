"""Triple-pendulum model family — capability beyond the reference.

The reference stops at a WIP two-link symbolic derivation
(``/root/reference/symbolic/dynamics_double.py:1-3``) and a hard-coded
``state_dim = 4`` controller (``optimization.cc:197-198``). The triple pole
exercises the full pipeline one more link out: SymPy Euler-Lagrange
derivation -> machine-generated JAX kernel with analytic Jacobians ->
model-generic MPC (both the vmapped reference path and the batch-in-lanes
condensed fast path) with zero model-specific wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu import (
    TRIPLE_CARTPOLE,
    OptimizationParams,
    TripleCartPoleParams,
    default_triple_params,
    get_model,
    make_mpc,
    run_closed_loop,
    run_closed_loop_lanes,
)
from cartpole_tpu.ops.integrate import rollout
from cartpole_tpu.ops.solver import NLSTerminationState

UP = np.pi / 2


def _no_failures(term):
    term = np.asarray(term)
    assert not np.any(term == NLSTerminationState.QP_INDEFINITE)
    assert not np.any(term == NLSTerminationState.MAX_LAMBDA)


def _stabilization_params():
    """Disturbance-rejection config near upright: all-soft terminal costs
    and no sinusoid kick (hard terminal equalities across a 0.6 s window
    are multiplier-ill-posed for tall chains — the double-pole finding in
    docs/PARITY.md applies one link further out too)."""
    return OptimizationParams(
        max_iterations=10,
        state_spacing=5,
        window_length=60,
        th_final_cost_weight=150.0,
        th_dot_final_cost_weight=10.0,
        b_x_dot_final_cost_weight=10.0,
        u_guess_sinusoid_amplitude=0.0,
    )


@pytest.fixture(scope="module")
def triple_oracle():
    from cartpole_tpu.symbolic.lagrangian import make_numeric_triple

    return make_numeric_triple()


class TestTripleDynamics:
    def test_matches_sympy_oracle(self, triple_oracle):
        """The committed machine-generated kernel agrees with an
        independently lambdified Euler-Lagrange derivation."""
        p = default_triple_params(jnp.float64)
        pt = tuple(float(getattr(p, f)) for f in
                   ("m_b", "m_1", "m_2", "m_3", "l_1", "l_2", "l_3", "g"))
        rng = np.random.RandomState(7)
        for _ in range(10):
            x = rng.uniform(-2.0, 2.0, 8)
            u = rng.uniform(-5.0, 5.0)
            forces = rng.uniform(-1.0, 1.0, 8)
            ours = np.asarray(
                TRIPLE_CARTPOLE.dynamics(
                    p, x, u, forces[0:2], forces[2:4], forces[4:6],
                    forces[6:8],
                )
            )
            ref = triple_oracle(pt, x, u, forces)
            np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-11)

    def test_analytic_jacobians_match_ad(self):
        p = default_triple_params(jnp.float64)
        f = lambda x_, u_: TRIPLE_CARTPOLE.dynamics(p, x_, u_)
        rng = np.random.RandomState(3)
        for _ in range(5):
            x = jnp.asarray(rng.uniform(-2.0, 2.0, 8))
            u = float(rng.uniform(-5.0, 5.0))
            xd, J_x, J_u = TRIPLE_CARTPOLE.dynamics_jac(p, x, u)
            np.testing.assert_allclose(
                np.asarray(xd), np.asarray(f(x, u)), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(J_x), np.asarray(jax.jacfwd(f, 0)(x, u)),
                atol=1e-11,
            )
            np.testing.assert_allclose(
                np.asarray(J_u).ravel(),
                np.asarray(jax.jacfwd(f, 1)(x, u)).ravel(),
                atol=1e-11,
            )

    def test_energy_conservation(self):
        """The chain is conservative: total energy is invariant under the
        u = 0 RK4 rollout (the reference's dissipation-test tier,
        ``integration_test.cc:82-125``, inverted for a conservative model)."""
        p = default_triple_params(jnp.float64)
        x0 = jnp.asarray(
            [0.0, UP - 1.2, UP - 0.9, UP - 1.5, 0.0, 0.0, 0.0, 0.0]
        )
        f = lambda x_, u_: TRIPLE_CARTPOLE.dynamics(p, x_, u_)
        us = jnp.zeros((2000,))
        x_final, _ = jax.jit(
            lambda x: rollout(f, x, us, 1.0e-3)
        )(x0)
        e0 = float(TRIPLE_CARTPOLE.energy(p, x0))
        e1 = float(TRIPLE_CARTPOLE.energy(p, x_final))
        assert abs(e1 - e0) < 1e-6 * max(1.0, abs(e0))

    def test_registry_and_params_round_trip(self):
        assert get_model("triple") is TRIPLE_CARTPOLE
        assert TRIPLE_CARTPOLE.state_dim == 8
        assert TRIPLE_CARTPOLE.angle_indices == (1, 2, 3)
        p = TripleCartPoleParams(m_3=0.2, l_3=0.3)
        q = TripleCartPoleParams.from_json(p.to_json())
        assert q == p
        with pytest.raises(ValueError):
            TripleCartPoleParams.from_json('{"m_9": 1.0}')


class TestTripleMPC:
    def test_problem_dimensions(self):
        mpc = make_mpc(_stabilization_params(), TRIPLE_CARTPOLE)
        # 13 shooting states x 8 + 60 controls.
        assert mpc.spec.dim == 13 * 8 + 60
        assert mpc.spec.n_defect == 12 * 8
        # All-soft terminal objectives: only the initial pin is an equality.
        assert mpc.spec.n_eq == mpc.spec.n_defect + 8

    def test_stabilization_closed_loop(self):
        """Perturbed-upright recovery, vmapped reference path: the
        controller drives all three links back to rest at theta = pi/2."""
        mpc = make_mpc(_stabilization_params(), TRIPLE_CARTPOLE)
        dp = default_triple_params(jnp.float64)
        x0 = jnp.array(
            [0.0, UP + 0.08, UP - 0.04, UP + 0.02, 0.0, 0.0, 0.0, 0.0]
        )
        res = jax.jit(lambda x: run_closed_loop(mpc, x, dp, 300))(x0)
        xf = np.asarray(res.final_state)
        _no_failures(res.termination_states)
        assert np.abs(xf[1:4] - UP).max() < 1e-2
        assert np.abs(xf[4:]).max() < 5e-2
        assert abs(xf[0]) < 0.1

    def test_lanes_path_matches_vmapped(self):
        """Batch-in-lanes condensed fast path on the 8-state model: healthy
        solves and tick-for-tick agreement with the vmapped reference path
        over 30 closed-loop ticks (measured f64 deviation ~2e-15/tick,
        scripts/probe_triple_lanes.py). Stabilization itself is the
        vmapped sibling test's job: an equivalent-to-1e-13 fast path
        stabilizes exactly when the reference path does. (A ±0.06
        simultaneous perturbation of all three links is OUTSIDE this
        config's region of attraction — both paths diverge identically —
        so the perturbations here are equivalence fodder, not a recovery
        claim.)"""
        mpc = make_mpc(_stabilization_params(), TRIPLE_CARTPOLE)
        dp = default_triple_params(jnp.float64)
        rng = np.random.RandomState(11)
        B = 4
        x0s = np.tile(
            np.array([0.0, UP, UP, UP, 0.0, 0.0, 0.0, 0.0]), (B, 1)
        )
        x0s[:, 1:4] += rng.uniform(-0.06, 0.06, (B, 3))
        x0s = jnp.asarray(x0s)
        ticks = 30
        res_l = jax.jit(
            lambda x: run_closed_loop_lanes(mpc, x, dp, ticks)
        )(x0s)
        res_v = jax.jit(
            jax.vmap(lambda x: run_closed_loop(mpc, x, dp, ticks))
        )(x0s)
        _no_failures(res_l.termination_states)
        _no_failures(res_v.termination_states)
        xl = np.asarray(res_l.final_state)
        xv = np.asarray(res_v.final_state)
        assert np.abs(xl - xv).max() < 1e-10, (xl, xv)
        ul = np.asarray(res_l.controls)
        uv = np.asarray(res_v.controls)
        assert np.abs(ul - uv).max() < 1e-8


class TestTrackedSwingUp:
    """Triple swing-up via offline trajectory optimization + tracking —
    the formulation the round-4 receding-horizon negative
    (``triple_swingup.json``) pointed at. ``scripts/probe_triple_trajopt
    .py`` solved the full 3 s window as ONE fixed-trip GN trajectory
    optimization (f64, hard terminal equalities at upright: violation
    3.7e-6, terminal angle error 8e-6, max |u| ~11 — force was indeed
    never the binding constraint); the committed artifact
    ``triple_swingup_traj.npz`` is its solution. This test closes the
    loop on the 1 kHz plant: replay the planned controls through the
    swing phase, then hand off to the perturbed-upright MPC for the
    catch + stabilization. The full replanned-tracking pipeline (re-solve
    the remaining window every 40 ticks; every re-solve converges in 3-8
    iterations) is recorded in ``triple_replay.json``.
    """

    def test_offline_trajectory_plus_mpc_catch(self):
        import pathlib

        npz = pathlib.Path(__file__).resolve().parent.parent / \
            "triple_swingup_traj.npz"
        traj = np.load(npz)
        u_ref = jnp.asarray(np.asarray(traj["u"], np.float64))
        K = int(traj["window"])
        dp = default_triple_params(jnp.float64)
        hang = jnp.asarray([0.0, -UP, -UP, -UP, 0.0, 0.0, 0.0, 0.0])

        from cartpole_tpu.mpc.simulator import simulator_step

        # Open-loop replay of the swing phase (one scan program).
        handoff = K - 60

        def replay(x0):
            def body(x, u):
                return simulator_step(
                    dp, x, 0.01, u, model=TRIPLE_CARTPOLE
                ), None
            xf, _ = jax.lax.scan(body, x0, u_ref[:handoff])
            return xf

        x_mid = jax.jit(replay)(hang)
        # Mid-swing state must still track the offline plan (the plan's
        # shooting states are every 20 ticks -> index handoff//20).
        x_plan = np.asarray(traj["solution"])[: (K // 20 + 1) * 8].reshape(
            -1, 8)[handoff // 20]
        assert np.abs(np.asarray(x_mid) - x_plan).max() < 0.5, (
            "open-loop drift left the plan's corridor"
        )

        # MPC catch: perturbed-upright controller takes the high-energy
        # mid-swing state the plan delivers and finishes the job.
        mpc = make_mpc(
            OptimizationParams(
                window_length=60, state_spacing=5, max_iterations=8,
                th_final_cost_weight=150.0,
                th_dot_final_cost_weight=10.0,
                b_x_dot_final_cost_weight=10.0,
                u_guess_sinusoid_amplitude=0.0,
            ),
            TRIPLE_CARTPOLE,
        )
        res = jax.jit(
            lambda x: run_closed_loop(mpc, x, dp, 150)
        )(x_mid)
        _no_failures(res.termination_states)
        xf = np.asarray(res.final_state)
        ang_err = np.abs(
            np.mod(xf[1:4] - UP + np.pi, 2 * np.pi) - np.pi
        ).max()
        assert ang_err < 1e-2, xf
        assert np.abs(xf[4:]).max() < 0.1, xf
