"""Reachability analysis of the double-pole bench's stuck knockdowns
(VERDICT r2 item 2b, follow-up to scripts/probe_knockdowns.py).

probe_knockdowns.py showed the stuck set (down at tick 500) does NOT
respond to swing-up-sinusoid warm-start kicks at u_limit 300 (4-5/31
recover vs 6/31 control). This probe isolates WHY, on the saved stuck
states (knockdowns.json):

  A) same soft stabilization config but u_limit 600: if they recover,
     the 300 N force limit is the binding obstruction;
  B) the full swing-up configuration (hard terminal equalities, default
     sinusoid cold start, f64) at u_limit 300: the controller's best
     swing-up machinery on the stuck states;
  C) swing-up from clean HANG at u_limit 300 vs 600 (f64): whether
     double-pole swing-up at 300 is feasible for this controller AT ALL
     (the passing test, tests/test_double_mpc.py::test_swingup_closed_loop,
     requires 600).

Part A (f32, the deployment dtype) runs on the TPU with --tpu; parts B/C
are f64 reachability questions and default to CPU (f64 double-pole
compiles over the TPU tunnel have hung >35 min).

Usage: python scripts/probe_knockdown_reachability.py
       [--stuck knockdowns.json] [--json out.json] [--parts ABC]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_enable_x64", True)
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cartpole_tpu import OptimizationParams, get_model, make_mpc
from cartpole_tpu.mpc.lanes import run_closed_loop_lanes

UP = math.pi / 2
CHUNK = 50


def _upright(xf):
    th = np.asarray(xf)[:, 1:3]
    return np.all(
        np.abs(np.mod(th - UP + math.pi, 2 * math.pi) - math.pi) < 0.1,
        axis=1,
    )


def _run_chunked(mpc, x0s, dtype, ticks):
    """Chunked closed loop (tunnel-safe program length)."""
    from cartpole_tpu import MPCState

    dp = jax.tree.map(lambda v: jnp.asarray(v, dtype),
                      get_model("double").default_params())
    x = jnp.asarray(x0s, dtype)
    B = x.shape[0]
    sps = jnp.zeros((B,), dtype)
    st = MPCState(
        previous_solution=jnp.zeros((B, mpc.spec.dim), dtype),
        warm=jnp.zeros((B,), bool),
    )
    run = jax.jit(
        lambda x_, st_: run_closed_loop_lanes(
            mpc, x_, dp, CHUNK, sps, mpc_state=st_
        )
    )
    failed = 0
    for _ in range(ticks // CHUNK):
        res = run(x, st)
        x, st = res.final_state, res.final_mpc_state
        term = np.asarray(res.termination_states)
        failed += int(np.sum((term == 3) | (term == 4)))
    return np.asarray(x), failed


SOFT = dict(
    max_iterations=8, state_spacing=5, kkt_method="condensed",
    window_length=60, th_final_cost_weight=150.0,
    th_dot_final_cost_weight=10.0, b_x_dot_final_cost_weight=10.0,
    u_guess_sinusoid_amplitude=0.0,
)
SWINGUP = dict(
    max_iterations=10, state_spacing=5, kkt_method="condensed",
    window_length=60,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stuck", default="knockdowns.json")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--json", default="knockdown_reachability.json")
    ap.add_argument("--parts", default="ABC",
                    help="which experiments to run (subset of 'ABC')")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU (default forces CPU; "
                    "use for part A, the f32 deployment-dtype case)")
    args = ap.parse_args()

    with open(args.stuck) as f:
        stuck = np.asarray(json.load(f)["stuck_states"])
    n = len(stuck)
    # Pad to a multiple of 8 lanes with copies (dropped in the readout).
    pad = (-n) % 8
    xs = np.concatenate([stuck, stuck[:pad]], axis=0) if pad else stuck
    out = {"n_stuck": n}
    print(f"{n} stuck states loaded")

    # A) soft config, u_limit 600, f32 (the deployment dtype)
    if "A" in args.parts:
        _part_a(out, xs, n, args)

    # B) swing-up config (hard eqs + sinusoid cold start), u 300, f64
    if "B" in args.parts:
        _part_b(out, xs, n, args)

    # C) clean hang, swing-up config, u 300 vs 600, f64
    if "C" in args.parts:
        _part_c(out, args)

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.json}")


def _part_a(out, xs, n, args):
    mpc = make_mpc(OptimizationParams(u_limit=600.0, **SOFT),
                   get_model("double"))
    xf, failed = _run_chunked(mpc, xs, jnp.float32, args.ticks)
    rec = int(_upright(xf)[:n].sum())
    out["soft_ulimit600_recovered"] = rec
    out["soft_ulimit600_failed_solves"] = failed
    print(f"A) soft+u600   : {rec}/{n} recovered  (failed solves {failed})")


def _part_b(out, xs, n, args):
    mpc = make_mpc(OptimizationParams(**SWINGUP), get_model("double"))
    xf, failed = _run_chunked(mpc, xs, jnp.float64, args.ticks)
    rec = int(_upright(xf)[:n].sum())
    out["swingup_u300_recovered"] = rec
    out["swingup_u300_failed_solves"] = failed
    print(f"B) swingup u300: {rec}/{n} recovered  (failed solves {failed})")


def _part_c(out, args):
    hang = np.tile(np.array([0.0, -UP, -UP, 0.0, 0.0, 0.0]), (8, 1))
    hang[:, 0] += np.linspace(-0.1, 0.1, 8)
    for ul in (300.0, 600.0):
        mpc = make_mpc(OptimizationParams(u_limit=ul, **SWINGUP),
                       get_model("double"))
        xf, failed = _run_chunked(mpc, hang, jnp.float64, args.ticks)
        rec = int(_upright(xf).sum())
        out[f"hang_swingup_u{ul:g}_recovered"] = rec
        print(f"C) hang u{ul:g}: {rec}/8 swing up  (failed solves {failed})")


if __name__ == "__main__":
    sys.exit(main())
