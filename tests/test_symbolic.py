"""Symbolic-oracle parity: JAX dynamics vs independent SymPy derivation.

The two-implementation cross-check standing in for the ``pypendulum``
oracle of SURVEY.md §4 (the reference C++ cannot be built here — the
``mini_opt`` submodule is not vendored): the Euler-Lagrange equations are
re-derived from the Lagrangian by SymPy in ``cartpole_tpu/symbolic`` and
evaluated against the hand-written JAX models at random states.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cartpole_tpu import (
    DoubleCartPoleParams,
    SingleCartPoleParams,
    double_cartpole_dynamics,
    single_cartpole_dynamics,
)

sympy = pytest.importorskip("sympy")

from cartpole_tpu.symbolic import make_numeric_double, make_numeric_single  # noqa: E402


@pytest.fixture(scope="module")
def single_oracle():
    return make_numeric_single()


@pytest.fixture(scope="module")
def double_oracle():
    return make_numeric_double()


class TestSingleParity:
    def test_matches_at_random_states(self, single_oracle):
        rng = np.random.RandomState(0)
        p = SingleCartPoleParams(
            m_b=1.2, m_1=0.17, l_1=0.33, g=9.81, mu_b=0.05,
            v_mu_b=0.12, c_d_1=0.21, x_s=0.7, k_s=123.0,
        )
        pt = tuple(p.as_dict().values())
        for _ in range(25):
            x = rng.uniform(-2.0, 2.0, 4)
            u = rng.uniform(-50.0, 50.0)
            forces = rng.uniform(-5.0, 5.0, 4)
            got = np.asarray(
                single_cartpole_dynamics(
                    p, jnp.asarray(x), u, forces[:2], forces[2:]
                )
            )
            want = single_oracle(pt, x, u, forces)
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)

    def test_spring_engagement_both_sides(self, single_oracle):
        """Exercise the max(0, .) bumper branches at +/- wall contact."""
        p = SingleCartPoleParams()
        pt = tuple(p.as_dict().values())
        for b_x in (-1.5, -0.8, 0.0, 0.8, 1.5):
            x = np.array([b_x, 0.3, 0.1, -0.2])
            got = np.asarray(single_cartpole_dynamics(p, jnp.asarray(x), 1.0))
            want = single_oracle(pt, x, 1.0, np.zeros(4))
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


class TestCodegen:
    def test_generated_module_matches_handwritten(self, tmp_path):
        """The emitted JAX module (wrenfold-codegen analog) reproduces the
        hand-written dynamics."""
        import importlib.util

        from cartpole_tpu.symbolic import derive_single_cartpole
        from cartpole_tpu.symbolic.generate import generate_jax_module

        src = generate_jax_module(derive_single_cartpole(), "single")
        path = tmp_path / "gen_single.py"
        path.write_text(src)
        spec = importlib.util.spec_from_file_location("gen_single", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        p = SingleCartPoleParams()
        pt = tuple(p.as_dict().values())
        rng = np.random.RandomState(7)
        for _ in range(10):
            x = rng.uniform(-2, 2, 4)
            u = rng.uniform(-50, 50)
            f = rng.uniform(-3, 3, 4)
            got = np.asarray(mod.single_dynamics(pt, jnp.asarray(x), u, f))
            want = np.asarray(
                single_cartpole_dynamics(p, jnp.asarray(x), u, f[:2], f[2:])
            )
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11)


class TestDoubleParity:
    def test_matches_at_random_states(self, double_oracle):
        rng = np.random.RandomState(1)
        p = DoubleCartPoleParams(
            m_b=0.9, m_1=0.15, m_2=0.08, l_1=0.3, l_2=0.2, g=9.81
        )
        pt = tuple(p.as_dict().values())
        for _ in range(25):
            x = rng.uniform(-2.0, 2.0, 6)
            u = rng.uniform(-50.0, 50.0)
            forces = rng.uniform(-5.0, 5.0, 6)
            got = np.asarray(
                double_cartpole_dynamics(
                    p, jnp.asarray(x), u, forces[:2], forces[2:4], forces[4:]
                )
            )
            want = double_oracle(pt, x, u, forces)
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)
