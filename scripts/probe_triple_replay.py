"""Triple swing-up stage 2: track the offline trajectory to upright.

``probe_triple_trajopt.py`` produced a feasible 3-4 s swing-up trajectory
(``triple_swingup_traj.npz``: violation ~4e-6, terminal angle error 8e-6,
max |u| ~11). This probe closes the loop on the 1 kHz plant:

1. OPEN-LOOP replay of u*(t) — the triple from hang is chaotic, so pure
   replay is expected to drift; measured here for the record.
2. REPLANNED replay: every ``--replan`` ticks, re-solve the REMAINING
   trajectory (shrinking window, warm-started by the shifted reference —
   full-horizon receding trajectory optimization) from the measured
   plant state, apply its controls, repeat. The final segment (once the
   remaining window reaches MPC scale) hands off to the proven
   perturbed-upright MPC (``tests/test_triple.py``).

Success = every link upright (|angle err| < 0.1) with small rates at the
end, zero failed solves. Writes ``triple_replay.json``.
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
    "triple_replay.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replan", type=int, default=40,
                    help="ticks between trajectory re-solves (must be a "
                    "multiple of --spacing so the remaining window stays "
                    "divisible by the shooting spacing)")
    ap.add_argument("--spacing", type=int, default=20)
    ap.add_argument("--iters", type=int, default=60,
                    help="GN iterations per re-solve (warm-started)")
    ap.add_argument("--stabilize-window", type=int, default=60)
    ap.add_argument("--stabilize-ticks", type=int, default=150)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from cartpole_tpu import (
        MPCState, OptimizationParams, default_triple_params, get_model,
        make_mpc, run_closed_loop,
    )
    from cartpole_tpu.mpc.simulator import simulator_step

    model = get_model("triple")
    dp = default_triple_params(jnp.float64)
    up = math.pi / 2
    hang = jnp.asarray([0.0, -up, -up, -up, 0.0, 0.0, 0.0, 0.0])

    traj = np.load(os.path.join(os.path.dirname(OUT),
                                "triple_swingup_traj.npz"))
    u_ref = np.asarray(traj["u"], np.float64)  # (K,)
    K = int(traj["window"])
    sp = int(traj["spacing"])
    assert sp == args.spacing, (sp, args.spacing)
    u_limit = float(traj["u_limit"])
    results = {"date": time.strftime("%Y-%m-%d %H:%M:%S"), "window": K}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def angle_err(x):
        return float(np.max(np.abs(
            np.mod(np.asarray(x)[1:4] - up + math.pi, 2 * math.pi)
            - math.pi)))

    plant = jax.jit(
        lambda x, u: simulator_step(dp, x, 0.01, u, model=model)
    )

    # ---- 1. pure open-loop replay (expected to drift; recorded).
    x = hang
    for t in range(K):
        x = plant(x, jnp.asarray(u_ref[t]))
    results["open_loop"] = {
        "final_angle_err": round(angle_err(x), 4),
        "final_max_vel": round(float(np.max(np.abs(np.asarray(x)[4:]))), 4),
    }
    print("open_loop:", json.dumps(results["open_loop"]), flush=True)
    save()

    # ---- 2. replanned replay with shrinking horizon.
    def resolve(x_now, u_win, K_rem):
        """One full-horizon trajectory solve of the remaining K_rem
        ticks, warm-started on ``u_win`` (the surviving reference plan).
        ``MPC.step``'s warm start SHIFTS the previous u by one tick and
        rebuilds the shooting states by rollout (controller.py
        ``_initial_guess``; the state block of previous_solution is
        ignored), so the plan is pre-unshifted by one: the shift then
        lands the guess exactly on ``u_win``."""
        params = OptimizationParams(
            window_length=K_rem, state_spacing=args.spacing,
            max_iterations=args.iters, u_limit=u_limit,
            u_cost_weight=0.02, u_derivative_cost_weight=0.02,
            b_x_final_cost_weight=150.0,
        )
        mpc = make_mpc(params, model)
        sd = model.state_dim
        N_rem = K_rem // args.spacing + 1
        u_prev = np.concatenate([[u_win[0]], u_win[:-1]])
        z_prev = np.concatenate([np.zeros(N_rem * sd), u_prev])
        st = MPCState(
            previous_solution=jnp.asarray(z_prev),
            warm=jnp.asarray(True),
        )
        out, _ = jax.jit(
            lambda s, xx, m=mpc: m.step(s, xx, dp, 0.0)
        )(st, x_now)
        return mpc, out

    assert args.replan % args.spacing == 0
    x = hang
    t = 0
    n_failed = 0
    replans = []
    u_plan = u_ref.copy()
    while K - t > args.stabilize_window:
        K_rem = K - t
        mpc, out = resolve(x, u_plan[t:], K_rem)
        term = int(out.solver.termination_state)
        viol = float(out.solver.constraint_violation)
        if term in (3, 4):
            n_failed += 1
        u_new = np.asarray(out.u)
        replans.append({
            "tick": t, "window": K_rem, "termination": term,
            "violation": viol, "iterations": int(out.solver.n_iterations),
        })
        print("replan:", json.dumps(replans[-1]), flush=True)
        u_plan[t:] = u_new
        for k in range(t, min(t + args.replan, K - args.stabilize_window)):
            x = plant(x, jnp.asarray(u_plan[k]))
        t = min(t + args.replan, K - args.stabilize_window)
    results["replans"] = replans
    results["replan_n_failed"] = n_failed
    results["pre_stabilize"] = {
        "tick": t,
        "angle_err": round(angle_err(x), 4),
        "max_vel": round(float(np.max(np.abs(np.asarray(x)[4:]))), 4),
    }
    print("pre_stabilize:", json.dumps(results["pre_stabilize"]),
          flush=True)
    save()

    # ---- 3. hand off to the proven perturbed-upright MPC.
    params = OptimizationParams(
        window_length=args.stabilize_window, state_spacing=5,
        max_iterations=8,
        th_final_cost_weight=150.0, th_dot_final_cost_weight=10.0,
        b_x_dot_final_cost_weight=10.0,
        u_guess_sinusoid_amplitude=0.0,
    )
    mpc = make_mpc(params, model)
    res = jax.jit(
        lambda xx: run_closed_loop(mpc, xx, dp, args.stabilize_ticks, 0.0)
    )(x)
    term = np.asarray(res.termination_states)
    xf = np.asarray(res.final_state)
    results["stabilize"] = {
        "ticks": args.stabilize_ticks,
        "n_failed": int(np.sum((term == 3) | (term == 4))),
        "final_angle_err": round(angle_err(xf), 5),
        "final_max_vel": round(float(np.max(np.abs(xf[4:]))), 5),
    }
    results["success"] = bool(
        results["stabilize"]["final_angle_err"] < 0.1
        and results["stabilize"]["final_max_vel"] < 1.0
        and results["stabilize"]["n_failed"] == 0
        and n_failed == 0
    )
    save()
    print(json.dumps({k: results[k] for k in
                      ("stabilize", "success")}, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
