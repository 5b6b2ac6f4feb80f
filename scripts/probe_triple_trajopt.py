"""Triple-pendulum swing-up via offline trajectory optimization (r4 #8).

Round 4 proved the receding-horizon negative (``triple_swingup.json``):
no 0.6-1.0 s window MPC pumps three links up from hang, with force not
binding — horizon capability is. The standard answer is a ONE-SHOT
full-window trajectory solve (the solver already does fixed-trip GN over
arbitrary windows) followed by online tracking/stabilization. Stage 1
(this probe, f64 CPU): solve the whole swing-up as a single trajectory
optimization — window 2-5 s, hard terminal equalities at upright, cold
sinusoid starts over several amplitudes/lengths — and record which (if
any) converge to a feasible upright trajectory. Stage 2 (on success,
``tests/test_triple.py``): replay u*(t) open loop and hand off to the
perturbed-upright MPC (proven green) for stabilization.

Writes ``triple_trajopt.json``.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "triple_trajopt.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", default="300,400")
    ap.add_argument("--spacing", type=int, default=20)
    ap.add_argument("--amplitudes", default="0,10,30,60")
    ap.add_argument("--u-limit", type=float, default=800.0)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from cartpole_tpu import (
        OptimizationParams, default_triple_params, get_model, make_mpc,
    )

    model = get_model("triple")
    dp = default_triple_params(jnp.float64)
    up = math.pi / 2
    hang = jnp.asarray([0.0, -up, -up, -up, 0.0, 0.0, 0.0, 0.0])
    results = {"date": time.strftime("%Y-%m-%d %H:%M:%S"), "runs": []}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    best = None
    for K in [int(w) for w in args.windows.split(",")]:
        for amp in [float(a) for a in args.amplitudes.split(",")]:
            params = OptimizationParams(
                window_length=K, state_spacing=args.spacing,
                max_iterations=args.iters, u_limit=args.u_limit,
                u_guess_sinusoid_amplitude=amp,
                u_cost_weight=0.02, u_derivative_cost_weight=0.02,
                b_x_final_cost_weight=150.0,
                # hard equalities on every angle + rate (defaults):
                # th_final_cost_weight=-1 etc.
            )
            mpc = make_mpc(params, model)
            t0 = time.time()
            step = jax.jit(lambda s, x, m=mpc: m.step(s, x, dp, 0.0))
            out, _ = jax.block_until_ready(
                step(mpc.init_state(jnp.float64), hang)
            )
            wall = time.time() - t0
            term = int(out.solver.termination_state)
            viol = float(out.solver.constraint_violation)
            niter = int(out.solver.n_iterations)
            # Terminal state of the solved trajectory (predicted rollout).
            xT = np.asarray(out.predicted_states)[-1]
            ang_err = float(np.max(np.abs(
                np.mod(xT[1:4] - up + math.pi, 2 * math.pi) - math.pi)))
            vel = float(np.max(np.abs(xT[4:])))
            row = {
                "window": K, "amplitude": amp, "termination": term,
                "iterations": niter, "violation": viol,
                "terminal_angle_err": round(ang_err, 6),
                "terminal_vel": round(vel, 6),
                "max_abs_u": float(np.max(np.abs(np.asarray(out.u)))),
                "wall_s": round(wall, 1),
                "success": bool(term in (0, 1) and viol < 1e-5
                                and ang_err < 1e-3 and vel < 1e-2),
            }
            results["runs"].append(row)
            print(json.dumps(row), flush=True)
            save()
            if row["success"] and (best is None
                                   or viol < best["violation"]):
                best = dict(row)
                np.savez(
                    os.path.join(os.path.dirname(OUT),
                                 "triple_swingup_traj.npz"),
                    u=np.asarray(out.u),
                    predicted_states=np.asarray(out.predicted_states),
                    solution=np.asarray(out.solution),
                    window=K, spacing=args.spacing,
                    u_limit=args.u_limit,
                )
    results["best"] = best
    save()
    print("best:", json.dumps(best), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
