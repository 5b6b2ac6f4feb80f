"""Single cart-pole swing-up, end to end, with plots and logs.

The quick-start analog of the reference's ``model/scratch.py``: configure,
run a receding-horizon swing-up, print the solver summary of the final
solve, save trajectory plots / a rendered animation / the JSON solve log.

    python examples/swingup.py [--steps 250] [--out-dir /tmp/swingup]
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import math
import pathlib

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--out-dir", default="/tmp/swingup")
    ap.add_argument("--gif", action="store_true", help="render an animation")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import cartpole_tpu as ct
    from cartpole_tpu.analysis import plot_closed_loop
    from cartpole_tpu.utils import SolveLog, solver_summary
    from cartpole_tpu.viz import strip_charts

    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    params = ct.OptimizationParams(state_spacing=5, max_iterations=10)
    dyn = ct.default_single_params(jnp.float64)
    mpc = ct.make_mpc(params)
    x0 = jnp.array([0.0, -math.pi / 2, 0.0, 0.0])  # hanging down

    print(f"running {args.steps} receding-horizon ticks...")
    res = jax.jit(
        lambda x: ct.run_closed_loop(mpc, x, dyn, args.steps)
    )(x0)
    xf = np.asarray(res.final_state)
    print(f"final state: b_x={xf[0]:+.4f}  th={xf[1]:+.5f} "
          f"(target {math.pi/2:.5f})  b_v={xf[2]:+.1e}  th_v={xf[3]:+.1e}")

    # One more solve from the final state for a full diagnostics record.
    outputs, _ = jax.jit(lambda s, x: mpc.step(s, x, dyn))(
        res.final_mpc_state, res.final_state
    )
    print(solver_summary(outputs.solver))

    log = SolveLog()
    log.append(outputs)
    log.save(str(out / "log.json"))
    plot_closed_loop(res, save_to=str(out / "trajectory.png"))
    strip_charts(res, save_to=str(out / "strips.png"))
    if args.gif:
        from cartpole_tpu.viz import animate_closed_loop

        animate_closed_loop(res, stride=4, save_to=str(out / "swingup.gif"))
    print(f"wrote {out}/log.json, trajectory.png, strips.png"
          + (", swingup.gif" if args.gif else ""))


if __name__ == "__main__":
    main()
