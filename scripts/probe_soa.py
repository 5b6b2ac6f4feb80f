"""Probe: does unpacking (sd, M) state rows to per-coordinate (M,) arrays
(structure-of-arrays) beat the packed layout on TPU?

Theory: every (4, M) f32 intermediate pads its sublane dim 4 -> 8, doubling
HBM traffic at each fusion boundary; per-coordinate (M,) arrays have no
padding. Times the same 5-step RK4 rollout (the line-search evaluate load)
both ways with the dispatch-cancelling slope method.

Usage: python scripts/probe_soa.py [--lanes 163840] [--steps 5]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _timed(fn, args, inner, label):
    def scanned(n):
        def body(carry, _):
            return fn(*carry), None

        def run(*a):
            out, _ = jax.lax.scan(body, a, None, length=n)
            return out

        return jax.jit(run)

    times = {}
    for n in (inner, 3 * inner):
        f = scanned(n)
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
        best = math.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[3 * inner] - times[inner]) / (2 * inner)
    print(f"{label:32s} {per*1e3:9.3f} ms/call", flush=True)
    return per


def dyn_packed(params, x, u):
    from cartpole_tpu.models.single import single_cartpole_dynamics

    return single_cartpole_dynamics(params, x, u)


def dyn_soa(p, b_x, th, b_v, th_v, u):
    """single_cartpole_dynamics unpacked: 4 x (M,) in -> 4 x (M,) out."""
    m_b, m_1, l_1, g = p.m_b, p.m_1, p.l_1, p.g
    s, c = jnp.sin(th), jnp.cos(th)
    v1x = b_v - l_1 * s * th_v
    v1y = l_1 * c * th_v
    f_fric = -p.mu_b * (m_b + m_1) * g * jnp.tanh(
        b_v / jnp.maximum(p.v_mu_b, 1e-6)
    )
    n2 = v1x * v1x + v1y * v1y
    pos = n2 > 0
    speed = jnp.where(pos, jnp.sqrt(jnp.where(pos, n2, 1.0)), 0.0)
    drag_b = 0.5 * p.c_d_1 * speed * v1x
    drag_th = 0.5 * p.c_d_1 * speed * l_1 * (c * v1y - s * v1x)
    f_spring = -p.k_s * jnp.maximum(0.0, b_x - p.x_s) + p.k_s * jnp.maximum(
        0.0, -p.x_s - b_x
    )
    rhs_b = u + f_fric + f_spring + m_1 * l_1 * c * th_v * th_v - drag_b
    rhs_th = -m_1 * g * l_1 * c - drag_th
    det = m_1 * l_1 * l_1 * (m_b + m_1 * c * c)
    b_acc = (m_1 * l_1 * l_1 * rhs_b + m_1 * l_1 * s * rhs_th) / det
    th_acc = (m_1 * l_1 * s * rhs_b + (m_b + m_1) * rhs_th) / det
    return b_v, th_v, b_acc, th_acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=163840)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from cartpole_tpu import default_single_params
    from cartpole_tpu.ops.integrate import mod_pi

    dtype = jnp.float32
    M, T = args.lanes, args.steps
    dp = default_single_params(dtype)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (4, M)), dtype)
    us = jnp.asarray(rng.uniform(-5, 5, (T, M)), dtype)
    h = 0.01

    def roll_packed(x, us_):
        f = lambda x_, u_: dyn_packed(dp, x_, u_)
        for k in range(T):
            k1 = f(x, us_[k])
            k2 = f(x + k1 * (h * 0.5), us_[k])
            k3 = f(x + k2 * (h * 0.5), us_[k])
            k4 = f(x + k3 * h, us_[k])
            x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            x = x.at[1].set(mod_pi(x[1]))
        return (x, us_)

    def roll_soa(b_x, th, b_v, th_v, us_):
        x = (b_x, th, b_v, th_v)
        for k in range(T):
            u = us_[k]
            k1 = dyn_soa(dp, *x, u)
            x2 = tuple(a + b * (h * 0.5) for a, b in zip(x, k1))
            k2 = dyn_soa(dp, *x2, u)
            x3 = tuple(a + b * (h * 0.5) for a, b in zip(x, k2))
            k3 = dyn_soa(dp, *x3, u)
            x4 = tuple(a + b * h for a, b in zip(x, k3))
            k4 = dyn_soa(dp, *x4, u)
            x = tuple(
                a + (h / 6.0) * (c1 + 2.0 * c2 + 2.0 * c3 + c4)
                for a, c1, c2, c3, c4 in zip(x, k1, k2, k3, k4)
            )
            x = (x[0], mod_pi(x[1]), x[2], x[3])
        return (*x, us_)

    # Correctness cross-check first.
    out_p = jax.jit(roll_packed)(x0, us)[0]
    out_s = jax.jit(roll_soa)(x0[0], x0[1], x0[2], x0[3], us)
    err = max(
        float(jnp.max(jnp.abs(out_p[i] - out_s[i]))) for i in range(4)
    )
    print(f"packed-vs-soa max abs diff: {err:.3e}")

    _timed(roll_packed, (x0, us), args.reps, f"packed (4,{M}) x {T} RK4")
    _timed(roll_soa, (x0[0], x0[1], x0[2], x0[3], us), args.reps,
           f"soa 4x({M},) x {T} RK4")


if __name__ == "__main__":
    sys.exit(main())
