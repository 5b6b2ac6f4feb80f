"""First-principles floor model for the closed-loop tick (VERDICT r3 #2a).

The round-3 artifact said "memory-bound" while recording hbm_util 0.0024 —
contradictory. The batch sweep (bench_sweep.json) disambiguates: tick
latency is FLAT from batch 64 to 256 (fixed-cost bound) and near-LINEAR
from 1024 to 16384 at 0.24% of HBM bandwidth and ~0.005% of FLOP peak —
bound neither by bandwidth nor FLOPs but by the issue/launch granularity
of a long DEPENDENT chain of small kernels.

Model:  t_tick(B) ~= n_launches_per_tick * c_launch(B)

1. n_launches_per_tick — static census of the compiled bench program's
   scheduled HLO: kernels (fusions/custom-calls/copies) per while-loop
   body x the loop's semantic trip count (tick scan 50, GN scan 8,
   segment-jacobian scan T=5, line-search rollout 5, K=40 rollouts at
   unroll=4 -> 10 trips, 1 kHz plant substeps).
2. c_launch(B) — microbenchmark: scans whose bodies contain k unfusable
   stages (k = 1, 4, 16); the HLO of each probe is census'd the same way,
   so per-launch cost = slope of (time vs counted kernels), not an
   assumption about what XLA fused.

Writes launch_floor.json with the model-vs-measured table. Timing follows
CLAUDE.md: sync via host transfer of a small output; repetitions live
INSIDE one jit program so the ~30-60 ms tunneled dispatch amortizes away.
"""

from __future__ import annotations

import argparse
import json
import re
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = __file__.rsplit("/", 2)[0]
jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:4]


def _time(f, *args, reps=5):
    f(*args)  # compile/warm
    _sync(f(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------------- HLO census
_KERNEL_KINDS = ("fusion", "custom-call", "copy", "dot", "transpose",
                 "reduce", "convert")


def parse_hlo(text: str):
    """-> (comps: name -> kernel-instruction count,
           whiles: list of (parent, body, src, carry_desc))."""
    comps: dict[str, list[str]] = {}
    cur = None
    for ln in text.splitlines():
        m = re.match(r"(?:ENTRY )?%([\w\.\-]+) \(.*\) -> .*\{", ln)
        if m:
            cur = m.group(1)
            comps[cur] = []
            continue
        if cur is not None:
            if ln.startswith("}"):
                cur = None
            else:
                comps[cur].append(ln.strip())
    kre = re.compile(r"= [^ ]+ (" + "|".join(_KERNEL_KINDS) + r")\(")
    kcount = {
        name: sum(1 for ln in clines if kre.search(ln))
        for name, clines in comps.items()
    }
    whiles = []
    for cname, clines in comps.items():
        for ln in clines:
            m = re.search(r"= .* while\(.*body=%([\w\.\-]+)", ln)
            if m:
                src = re.search(
                    r'source_file="([^"]+)" source_line=(\d+)', ln
                )
                whiles.append({
                    "parent": cname,
                    "body": m.group(1),
                    "src": (f"{src.group(1).rsplit('/', 1)[-1]}"
                            f":{src.group(2)}" if src else "?"),
                })
    return kcount, whiles


def census_bench_program(batch: int, ticks: int):
    """Compile the exact bench runner; launches/tick with semantic trip
    counts per loop source location."""
    import bench as bench_mod

    args = argparse.Namespace(
        model="single", spacing=5, layout="lanes", batch=batch, ticks=ticks
    )
    dtype = jnp.float32
    from cartpole_tpu import get_model

    dp = jax.tree.map(
        lambda v: jnp.asarray(v, dtype),
        get_model("single").default_params(),
    )
    mpc, run, _ = bench_mod._build_runner(args, ticks, "condensed", dtype, dp)
    x0s = bench_mod.make_x0s("single", batch, dtype)
    sps = jnp.zeros((batch,), dtype)
    st0 = bench_mod._cold_state(mpc, batch, dtype)
    text = run.lower(x0s, sps, st0).compile().as_text()
    kcount, whiles = parse_hlo(text)

    # Semantic trip counts by loop nest position (mpc/lanes.py structure):
    #   tick scan (mpc/lanes.py ~936): ticks trips, per program
    #   GN scan (mpc/lanes.py ~691): 8 trips, per tick
    #   inside GN: segment-jac scan (ops/lanes.py ~455) 5 trips,
    #              line-search rollout (ops/lanes.py ~237) 5 trips
    #   per tick directly: final-evaluate rollout 5, guess-fill rollout 10,
    #              predicted rollout 10, plant substeps ~3.
    by_body = {w["body"]: w for w in whiles}
    gn_body = next(
        w["body"] for w in whiles if "mpc/lanes" in "" or ":691" in w["src"]
    )
    tick_body = next(w["body"] for w in whiles if ":936" in w["src"])

    def nested_launches(body, trips_map):
        n = kcount.get(body, 0)
        for w in whiles:
            if w["parent"] == body:
                n += trips_map.get(w["body"], 1) * nested_launches(
                    w["body"], trips_map
                )
        return n

    # Trip counts: identify loops by parent + src.
    trips_map = {}
    for w in whiles:
        if w["body"] == tick_body:
            trips_map[w["body"]] = ticks
        elif w["body"] == gn_body:
            trips_map[w["body"]] = 8
        elif w["parent"] == gn_body:
            trips_map[w["body"]] = 5  # seg-jac or line-search rollout
        elif ":455" in w["src"]:
            trips_map[w["body"]] = 5
        else:
            # tick-level rollouts: K=40 unroll=4 -> 10 trips; the plant
            # substep scan and final evaluate are small. Distinguish by
            # body kernel count (K rollouts carry 6 kernels here).
            trips_map[w["body"]] = 10 if kcount.get(w["body"], 0) >= 4 else 4

    per_tick = nested_launches(tick_body, trips_map)
    total = kcount.get("main.208", max(kcount.values())) + ticks * per_tick
    detail = [
        {"src": w["src"], "body_kernels": kcount.get(w["body"], 0),
         "trips": trips_map.get(w["body"])}
        for w in whiles
    ]
    return {
        "batch": batch,
        "ticks": ticks,
        "loops": detail,
        "launches_per_tick": per_tick,
        "launches_total": total,
    }


# ------------------------------------------------------------- micro probe
def _probe_program(B: int, k_stages: int, L: int):
    """A scan of L trips whose body holds ``k_stages`` reduce-stages (each
    at least one kernel). Returns (jitted fn, args, kernels_per_trip
    counted from its own compiled HLO)."""

    def body(x, _):
        for i in range(k_stages):
            s = jnp.sum(x, axis=0, keepdims=True)
            x = x * 0.999 + s * (1e-9 * (i + 1))
        return x, None

    def run(x):
        return jax.lax.scan(body, x, None, length=L)[0]

    x = jnp.ones((8, B), jnp.float32)
    f = jax.jit(run)
    text = f.lower(x).compile().as_text()
    kcount, whiles = parse_hlo(text)
    body_kernels = max(
        (kcount.get(w["body"], 0) for w in whiles), default=0
    )
    return f, (x,), body_kernels


def probe_launch_cost(B: int, L: int = 4096):
    """Per-kernel-launch cost from the slope of time vs kernels/trip."""
    pts = []
    for k in (1, 4, 16):
        f, args, kernels = _probe_program(B, k, L)
        t = _time(f, *args)
        pts.append((kernels, t / L))
        print(f"  B={B} stages={k}: kernels/trip={kernels} "
              f"per-trip={t / L * 1e6:.2f} us", flush=True)
    ks = np.array([p[0] for p in pts], float)
    ts = np.array([p[1] for p in pts], float)
    slope, intercept = np.polyfit(ks, ts, 1)
    return {"points": [{"kernels_per_trip": int(k), "per_trip_us":
                        round(t * 1e6, 3)} for k, t in pts],
            "per_launch_us": round(slope * 1e6, 3),
            "loop_overhead_us": round(intercept * 1e6, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--census-only", action="store_true")
    ap.add_argument("--out", default=REPO + "/launch_floor.json")
    args = ap.parse_args()

    dev = jax.devices()[0]
    out = {"device": str(dev.platform),
           "device_kind": getattr(dev, "device_kind", "")}

    census = census_bench_program(args.batch, args.ticks)
    out["census"] = census
    print(json.dumps({k: census[k] for k in
                      ("launches_per_tick", "loops")}, indent=1))

    if not args.census_only:
        costs = {}
        for B in (64, 1024, 4096, 16384):
            costs[B] = probe_launch_cost(B)
            print(f"B={B}: per-launch {costs[B]['per_launch_us']} us "
                  f"(+{costs[B]['loop_overhead_us']} us loop overhead)",
                  flush=True)
        out["launch_cost"] = {str(k): v for k, v in costs.items()}

        try:
            with open(REPO + "/bench_sweep.json") as f:
                sweep = json.load(f)
        except OSError:
            sweep = []
        lpt = census["launches_per_tick"]
        model = {}
        for row in sweep:
            B = row["batch"]
            if B not in costs:
                continue
            pred_ms = lpt * costs[B]["per_launch_us"] / 1e3
            model[str(B)] = {
                "measured_tick_ms": row["tick_latency_ms"],
                "launch_floor_ms": round(pred_ms, 3),
                "explained_fraction": round(
                    pred_ms / row["tick_latency_ms"], 3),
            }
        out["floor_vs_sweep"] = model
        print(json.dumps(model, indent=1))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, REPO)
    main()
