"""Fused GN-iteration Pallas megakernel — equivalence with the XLA path.

``ops/fused.py`` re-expresses one entire damped-GN iteration of the
condensed lanes solver (``mpc/lanes.py::_solve_lanes_impl``) as a single
Pallas kernel whose tile arithmetic lives in a pure-jnp ``body`` shared
verbatim with a CPU emulation path. These tests run that shared body on
CPU (f64 via ``tests/conftest.py``) through ``fused_opts={"emulate":
True (default on CPU), "eager_loop": True}`` and assert solve-level
equivalence against the XLA scan body: same controls, same termination
states, same iteration counts, matching per-iteration traces. f64
agreement is ~1e-12 (same algorithm, some reductions reordered).

Why not Pallas interpret mode / a jitted emulation: the fully-unrolled
~15k-op iteration takes XLA:CPU >6 minutes to compile as ONE program
(measured 2026-08-20, any window size — LLVM on a single giant fused
loop); eager dispatch of the same body runs in seconds. On-device f32
validation of the real Mosaic kernel lives in
``scripts/probe_fused_tpu.py`` (tunnel Pallas compiles are unreliable in
CI — CLAUDE.md).

Reference capability: the hot loop of
``/root/reference/optimization/optimization.cc:110-155``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu import (
    OptimizationParams,
    default_double_params,
    default_single_params,
    make_mpc,
)
from cartpole_tpu.models import DOUBLE_CARTPOLE
from cartpole_tpu.mpc.controller import MPCState
from cartpole_tpu.mpc.lanes import step_lanes


def _x0_batch(B, seed=0, dim=4):
    rng = np.random.RandomState(seed)
    base = [0.0, -np.pi / 2, 0.0, 0.0] if dim == 4 else [
        0.0, -np.pi / 2, -np.pi / 2, 0.0, 0.0, 0.0
    ]
    x0 = np.tile(base, (B, 1))
    x0[:, 0] += rng.uniform(-0.5, 0.5, B)
    x0[:, 1] += rng.uniform(-0.5, 0.5, B)
    return jnp.asarray(x0)


def _state(mpc, B, dtype=jnp.float64):
    return MPCState(
        previous_solution=jnp.zeros((B, mpc.spec.dim), dtype),
        warm=jnp.zeros((B,), bool),
    )


def _mpc(**kw):
    kw.setdefault("max_iterations", 8)
    kw.setdefault("state_spacing", 5)
    kw.setdefault("kkt_method", "condensed")
    return make_mpc(OptimizationParams(**kw), kw.pop("model", None)) \
        if "model" in kw else make_mpc(OptimizationParams(**kw))


def _assert_step_equal(out_f, out_x, u_atol=1e-8):
    np.testing.assert_allclose(
        np.asarray(out_f.u), np.asarray(out_x.u), atol=u_atol
    )
    np.testing.assert_allclose(
        np.asarray(out_f.solution), np.asarray(out_x.solution), atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(out_f.solver.termination_state),
        np.asarray(out_x.solver.termination_state),
    )
    np.testing.assert_array_equal(
        np.asarray(out_f.solver.n_iterations),
        np.asarray(out_x.solver.n_iterations),
    )
    np.testing.assert_allclose(
        np.asarray(out_f.solver.first_order_norm),
        np.asarray(out_x.solver.first_order_norm),
        rtol=1e-5, atol=1e-9,
    )
    # Per-iteration traces: cost/violation/lambda/alpha, NaN-masked
    # identically (post-termination entries are NaN on both paths).
    for name in ("iter_cost", "iter_violation", "iter_lambda",
                 "iter_step_size"):
        a = np.asarray(getattr(out_f.solver, name))
        b = np.asarray(getattr(out_x.solver, name))
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=1e-6, atol=1e-9)


class TestFusedEquivalence:
    def test_cold_start_matches_xla(self):
        """Cold-start solves (the hard, many-iteration regime) must agree
        trace-for-trace with the XLA scan body."""
        B = 4
        mpc = _mpc()
        dp = default_single_params(jnp.float64)
        x0 = _x0_batch(B)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_x, _ = jax.jit(
            lambda s, x: step_lanes(mpc, s, x, dp, sp)
        )(st, x0)
        out_f, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        _assert_step_equal(out_f, out_x)

    def test_warm_start_and_bounds(self):
        """Warm-started ticks with binding control bounds (low u_limit
        forces clamping in the line search) stay equivalent."""
        B = 3
        mpc = _mpc(u_limit=40.0)
        dp = default_single_params(jnp.float64)
        x0 = _x0_batch(B, seed=3)
        sp = jnp.zeros((B,), jnp.float64)
        step_x = jax.jit(lambda s, x: step_lanes(mpc, s, x, dp, sp))
        step_f = lambda s, x: step_lanes(
            mpc, s, x, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        st_x = st_f = _state(mpc, B)
        x_x = x_f = x0
        for tick in range(3):
            out_x, st_x = step_x(st_x, x_x)
            out_f, st_f = step_f(st_f, x_f)
            _assert_step_equal(out_f, out_x, u_atol=1e-6)
            # Drive both with the XLA one-step prediction so state inputs
            # stay identical across ticks.
            x_x = x_f = out_x.predicted_states[:, 0, :]

    def test_double_pole_soft_costs(self):
        """Double pole in the bench's all-soft regime (n_t = 0: no hard
        terminal equalities — exercises the n_all = n_tc branch)."""
        B = 2
        mpc = make_mpc(
            OptimizationParams(
                max_iterations=8, state_spacing=5, kkt_method="condensed",
                window_length=60,
                th_final_cost_weight=150.0,
                th_dot_final_cost_weight=10.0,
                b_x_dot_final_cost_weight=10.0,
                u_guess_sinusoid_amplitude=0.0,
            ),
            DOUBLE_CARTPOLE,
        )
        dp = default_double_params(jnp.float64)
        rng = np.random.RandomState(7)
        up = np.tile([0.0, np.pi / 2, np.pi / 2, 0.0, 0.0, 0.0], (B, 1))
        up += rng.uniform(-0.05, 0.05, up.shape)
        x0 = jnp.asarray(up)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_x, _ = jax.jit(
            lambda s, x: step_lanes(mpc, s, x, dp, sp)
        )(st, x0)
        out_f, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        _assert_step_equal(out_f, out_x, u_atol=1e-6)

    def test_unsupported_configs_raise(self):
        mpc = _mpc(rebase_equalities=True)
        dp = default_single_params(jnp.float64)
        with pytest.raises(ValueError, match="not covered"):
            step_lanes(
                mpc, _state(mpc, 2), _x0_batch(2),
                dp, jnp.zeros((2,)), fused=True,
            )

    def test_per_instance_dynamics_params(self):
        """Per-instance (mass, length)-grid dynamics params — the
        BASELINE config-#5 sweep shape — through the fused body's
        (n_p, B) VMEM-block path, equivalent to the XLA lanes path."""
        B = 4
        mpc = _mpc()
        base = default_single_params(jnp.float64)
        grid = np.stack(np.meshgrid([0.08, 0.12], [0.2, 0.3]),
                        -1).reshape(B, 2)
        dp = dataclasses.replace(
            base, m_1=jnp.asarray(grid[:, 0]), l_1=jnp.asarray(grid[:, 1])
        )
        x0 = _x0_batch(B, seed=11)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_x, _ = jax.jit(
            lambda s, x: step_lanes(mpc, s, x, dp, sp)
        )(st, x0)
        out_f, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        _assert_step_equal(out_f, out_x)
        # The grid must actually matter: different plants, different u.
        u = np.asarray(out_f.u)
        assert np.abs(u[0] - u[-1]).max() > 1e-3

    def test_per_instance_params_tile_split(self):
        """Batched params with batch_tile < B: each tile must see ITS
        slice of the (n_p, B) params block."""
        B = 4
        mpc = _mpc(max_iterations=4)
        base = default_single_params(jnp.float64)
        dp = dataclasses.replace(
            base,
            m_1=jnp.asarray([0.08, 0.1, 0.12, 0.14]),
            l_1=jnp.asarray([0.2, 0.25, 0.3, 0.35]),
        )
        x0 = _x0_batch(B, seed=12)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_x, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        out_f, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"batch_tile": 2, "eager_loop": True},
        )
        _assert_step_equal(out_f, out_x, u_atol=1e-9)

    def test_single_launch_matches_scan(self):
        """single_launch=True (whole solve in one kernel: iteration as
        the minor grid dim, VMEM-resident carry) must reproduce the
        per-iteration launch path exactly, traces included."""
        B = 4
        mpc = _mpc()
        dp = default_single_params(jnp.float64)
        x0 = _x0_batch(B, seed=21)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_ref, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        out_sl, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"single_launch": True},
        )
        _assert_step_equal(out_sl, out_ref, u_atol=1e-12)

    def test_single_launch_tile_split(self):
        """Two batch tiles in single-launch mode: each tile's carry must
        complete all iterations independently (grid order (g, it))."""
        B = 4
        mpc = _mpc(max_iterations=4)
        dp = default_single_params(jnp.float64)
        x0 = _x0_batch(B, seed=22)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_ref, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"single_launch": True},
        )
        out_sl, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"single_launch": True, "batch_tile": 2},
        )
        _assert_step_equal(out_sl, out_ref, u_atol=1e-12)

    def test_batch_tile_split(self):
        """batch_tile < B exercises the grid dimension (two tiles)."""
        B = 4
        mpc = _mpc(max_iterations=4)
        dp = default_single_params(jnp.float64)
        x0 = _x0_batch(B, seed=5)
        sp = jnp.zeros((B,), jnp.float64)
        st = _state(mpc, B)
        out_x, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"eager_loop": True},
        )
        out_f, _ = step_lanes(
            mpc, st, x0, dp, sp, fused=True,
            fused_opts={"batch_tile": 2, "eager_loop": True},
        )
        _assert_step_equal(out_f, out_x, u_atol=1e-9)
