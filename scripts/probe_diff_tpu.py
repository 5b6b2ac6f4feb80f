"""TPU f32 sanity check for the differentiable MPC (VERDICT r4 #6).

All FD validation of ``make_differentiable_solve`` runs on CPU/f64
(``tests/test_diff*.py``). The ``"unrolled"`` method exists BECAUSE of a
backend-specific miscompile (XLA:CPU reverse-mode through the condensed
solver), so its one unvalidated backend was the deployment one. This
probe computes, ON THE CHIP in f32, the gradient of a scalar loss
``L = sum(u*^2)`` through one MPC solve wrt ``x_current`` and a dynamics
parameter (``m_1``), for BOTH backward methods, against central finite
differences at loose f32 tolerance. Writes ``diff_tpu_f32.json``.

Pass = cosine similarity > 0.999 and max relative component error < 5%
on the x gradient, relative error < 5% on dL/dm_1 (f32 FD of a solver
with 1e-5 relative exit tolerance is itself ~1e-2-noisy; the check is a
sanity gate, not a precision claim — the precision claims live in the
f64 tests).
"""

import json
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

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "diff_tpu_f32.json",
)


def main():
    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.diff import make_differentiable_solve

    dtype = jnp.float32
    mpc = make_mpc(OptimizationParams(
        max_iterations=12, state_spacing=5, kkt_method="condensed",
    ))
    dp = default_single_params(dtype)
    # Interior operating point (perturbed-upright disturbance rejection):
    # a near-hang swing-up start saturates the controls, where "ift" is
    # documented best-effort-only — the on-chip interior-exactness claim
    # is what this probe checks. Saturation is recorded from the runtime
    # diagnostics below.
    x0 = jnp.asarray([0.15, math.pi / 2 - 0.15, 0.1, -0.2], dtype)
    state = mpc.init_state(dtype)
    u_start = mpc.spec.u_start

    results = {
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "dtype": "float32",
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def loss_of(z):
        return jnp.sum(z[u_start:] ** 2)

    # Saturation diagnostics at the test point (ift is interior-exact;
    # n_active > 0 would reclassify this probe's expectation).
    diag_solve = make_differentiable_solve(
        mpc, with_diagnostics=True, method="ift")
    _, diag = jax.jit(
        lambda: diag_solve(x0, dp, jnp.zeros((), dtype), state))()
    results["diagnostics"] = {
        "n_active": int(diag["n_active"]),
        "termination_state": int(diag["termination_state"]),
    }
    print("diagnostics:", json.dumps(results["diagnostics"]), flush=True)

    # Truth baseline: CPU/f64 central FD in a subprocess (this process's
    # backend is the chip and x64 is off). f32 FD THROUGH an iterative
    # solver is not a usable baseline for the small m_1 component:
    # measured 2026-08-20, the f32 solver's termination plateau noise
    # swamps a 0.3% parameter perturbation (FD said -2337 where BOTH
    # independent AD methods agreed on -4414; the f64 FD agrees with the
    # AD methods). Cross-backend comparison is the point of the probe
    # anyway: TPU-f32 gradients vs the FD-validated f64 truth.
    import subprocess

    fd_src = r"""
import json, math, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import dataclasses
import jax.numpy as jnp
sys.path.insert(0, %r)
from cartpole_tpu import OptimizationParams, default_single_params, make_mpc
mpc = make_mpc(OptimizationParams(
    max_iterations=12, state_spacing=5, kkt_method="condensed"))
dp = default_single_params(jnp.float64)
x0 = jnp.asarray(%s, jnp.float64)
state = mpc.init_state(jnp.float64)
u_start = mpc.spec.u_start
def loss(x, m1):
    dpx = dataclasses.replace(dp, m_1=jnp.asarray(m1, jnp.float64))
    out, _ = mpc.step(state, x, dpx, 0.0)
    return jnp.sum(out.solution[u_start:] ** 2)
fj = jax.jit(loss)
f = lambda x, m1: float(fj(x, m1))
eps_x, eps_m = 1e-5, 1e-6
m1_0 = float(dp.m_1)
g_x = []
import numpy as np
for i in range(4):
    e = np.zeros(4); e[i] = eps_x
    g_x.append((f(x0 + e, m1_0) - f(x0 - e, m1_0)) / (2 * eps_x))
g_m = (f(x0, m1_0 + eps_m) - f(x0, m1_0 - eps_m)) / (2 * eps_m)
print(json.dumps({"g_x": g_x, "g_m1": g_m}))
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
       json.dumps([float(v) for v in np.asarray(x0)]))
    print("computing f64 CPU FD baseline (subprocess) ...", flush=True)
    proc = subprocess.run(
        [sys.executable, "-c", fd_src], capture_output=True, text=True,
        timeout=1200,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("f64 FD subprocess failed")
    fd = json.loads(proc.stdout.strip().splitlines()[-1])
    g_fd_x = np.asarray(fd["g_x"])
    g_fd_m = float(fd["g_m1"])
    results["fd_f64_cpu"] = fd
    print("fd(f64):", json.dumps(fd), flush=True)
    save()

    failures = []
    for method in ("ift", "unrolled"):
        solve = make_differentiable_solve(mpc, method=method)

        def loss(x, dpx):
            return loss_of(solve(x, dpx, jnp.zeros((), dtype), state))

        print(f"[{method}] compiling grad ...", flush=True)
        t0 = time.perf_counter()
        gx, gdp = jax.jit(jax.grad(loss, argnums=(0, 1)))(x0, dp)
        gx = np.asarray(gx, np.float64)
        gm = float(np.asarray(gdp.m_1))
        wall = time.perf_counter() - t0
        cos = float(np.dot(gx, g_fd_x)
                    / (np.linalg.norm(gx) * np.linalg.norm(g_fd_x)))
        rel_x = float(np.max(np.abs(gx - g_fd_x)
                             / np.maximum(np.abs(g_fd_x), 1e-3)))
        rel_m = float(abs(gm - g_fd_m) / max(abs(g_fd_m), 1e-3))
        row = {
            "compile_plus_run_s": round(wall, 1),
            "g_x": [float(v) for v in gx],
            "g_m1": gm,
            "cos_vs_fd": round(cos, 6),
            "max_rel_err_x": round(rel_x, 4),
            "rel_err_m1": round(rel_m, 4),
        }
        results[method] = row
        print(f"[{method}]", json.dumps(row), flush=True)
        if cos < 0.999:
            failures.append(f"{method}: cos {cos:.4f} < 0.999")
        if rel_x > 0.05:
            failures.append(f"{method}: max_rel_err_x {rel_x:.3f} > 0.05")
        if rel_m > 0.05:
            failures.append(f"{method}: rel_err_m1 {rel_m:.3f} > 0.05")
        save()
    results["failures"] = failures
    results["pass"] = not failures
    save()
    print("PASS" if not failures else f"FAIL: {failures}", flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
