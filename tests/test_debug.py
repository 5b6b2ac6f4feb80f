"""Debug-mode (sanitizer-analog) tests — utils/debug.py.

Covers the capability of the reference's F_ASSERT boundary guards
(/root/reference/optimization/simulator.cc:13-14) and its sanitizer CI
builds: NaN/Inf detection that STOPS with a location, as opposed to the
production failure_mask path that keeps going (test_failure_handling.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu.utils.debug import (
    DebugCheckError,
    assert_all_finite,
    checked,
    debug_mode,
)


class TestDebugMode:
    def test_nan_raises_inside_scope(self):
        def f(x):
            return jnp.log(x)  # log(-1) -> NaN

        with debug_mode():
            with pytest.raises(FloatingPointError):
                jax.jit(f)(jnp.asarray(-1.0)).block_until_ready()

    def test_flags_restored_after_scope(self):
        before = jax.config.jax_debug_nans
        with debug_mode():
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == before
        # NaNs flow silently again outside the scope.
        out = jax.jit(jnp.log)(jnp.asarray(-1.0))
        assert np.isnan(np.asarray(out))

    def test_restored_even_on_exception(self):
        before = jax.config.jax_debug_infs
        with pytest.raises(RuntimeError):
            with debug_mode():
                raise RuntimeError("boom")
        assert jax.config.jax_debug_infs == before


class TestChecked:
    def test_catches_nan_inside_scan(self):
        # jax_debug_nans cannot localize inside lax.scan; checkify can.
        def step(carry, _):
            return jnp.sqrt(carry - 2.0), None  # goes negative -> NaN

        def f(x0):
            out, _ = jax.lax.scan(step, x0, None, length=3)
            return out

        with pytest.raises(DebugCheckError, match="nan"):
            checked(f)(jnp.asarray(1.0))

    def test_passes_through_clean_results(self):
        f = checked(lambda x: 2.0 * x + 1.0)
        assert float(f(jnp.asarray(3.0))) == 7.0

    def test_compiled_internally(self):
        # The wrapper jits the instrumented fn itself; repeated calls
        # reuse the compiled program.
        f = checked(jnp.cos)
        assert float(f(jnp.asarray(0.0))) == 1.0
        assert float(f(jnp.asarray(0.0))) == 1.0

    def test_solver_step_clean_under_checks(self):
        # The real condensed MPC step runs NaN-free under full float
        # checks on a plain swing-up state.
        import math

        from cartpole_tpu import (
            OptimizationParams,
            default_single_params,
            make_mpc,
        )

        mpc = make_mpc(OptimizationParams(max_iterations=3))
        dp = default_single_params(jnp.float32)
        x0 = jnp.asarray([0.0, -math.pi / 2, 0.0, 0.0], jnp.float32)

        def solve(x):
            st = mpc.init_state(jnp.float32)
            outputs, _ = mpc.step(st, x, dp, 0.0)
            return outputs.u

        u = checked(solve)(x0)
        assert np.all(np.isfinite(np.asarray(u)))


class TestAssertAllFinite:
    def test_clean_tree_passes(self):
        assert_all_finite({"a": jnp.ones(3), "b": (jnp.zeros(2),)})

    def test_reports_tree_path(self):
        tree = {"xs": jnp.ones((2, 2)),
                "warm": {"u": jnp.asarray([1.0, jnp.nan, jnp.inf])}}
        with pytest.raises(DebugCheckError) as exc:
            assert_all_finite(tree, name="state")
        msg = str(exc.value)
        assert "state" in msg and "warm" in msg and "u" in msg
        assert "2/3" in msg

    def test_integer_leaves_ignored(self):
        assert_all_finite({"counts": jnp.arange(5)})


class TestLeakCheck:
    def test_counts_live_buffers(self):
        import gc

        from cartpole_tpu.utils import leak_check

        # Collect BEFORE the baseline: the count/nbytes fields are deltas,
        # so arrays from earlier tests dying between baseline and report
        # would eat the +4 (seen once as 2 >= 4 in the round-4 CI proof).
        gc.collect()
        base = leak_check()
        keep = [(jnp.zeros((17, 3)) + i).block_until_ready()
                for i in range(4)]
        report = leak_check(baseline=base)
        # Per-shape delta is immune to unrelated same-window GC unless it
        # frees this exact dtype/shape (nothing else allocates (17, 3)).
        assert report["by_shape"].get("float64[17, 3]", 0) >= 4
        assert any("[17, 3]" in k for k in report["by_shape"])
        del keep
        gc.collect()
        report_after = leak_check(baseline=base)
        assert report_after["by_shape"].get("float64[17, 3]", 0) <= 0
        assert report_after["nbytes"] < report["nbytes"]

    def test_dict_baseline_subtracts_nbytes_and_shapes(self):
        """Passing a previous report as the baseline must zero out the
        setup footprint (count AND nbytes AND per-shape counts), so a
        leak-free loop after a heavy setup reads as clean."""
        from cartpole_tpu.utils import leak_check

        keep = [(jnp.zeros((23, 5)) + i).block_until_ready()
                for i in range(3)]
        base = leak_check()
        clean = leak_check(baseline=base)
        assert clean["count"] == 0
        assert clean["nbytes"] == 0
        assert not any("[23, 5]" in k for k in clean["by_shape"])
        extra = jnp.ones((23, 5)).block_until_ready()
        leaked = leak_check(baseline=base)
        assert leaked["count"] == 1
        assert leaked["nbytes"] == extra.nbytes
        assert any("[23, 5]" in k for k in leaked["by_shape"])
        del keep, extra
