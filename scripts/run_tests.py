"""Per-file process-isolated pytest runner — the CI test gate.

Round 3's single-process full-suite run died with a hard SIGABRT inside
XLA:CPU ``backend_compile_and_load`` at ``tests/test_triple.py`` ~75%
through the suite (``docs/ci_proof_r03.log``), while the same file passes
in isolation and the suspected pairing (``test_diff.py`` then
``test_triple.py`` in one process) also passes — an order-/state-dependent
PROCESS-level fault, not a test bug. The reference's gate survives because
its native tests are independent ctest binaries
(``/root/reference/.github/workflows/linux.yml:47-52``); this runner gives
the pytest suite the same property: each test file runs in its own
interpreter, so one XLA process-state corruption cannot take down the
gate, and any crash is localized to a file instead of "somewhere after 45
minutes".

Usage: python scripts/run_tests.py [--fail-fast] [pytest args...]
(extra args are forwarded to every per-file pytest invocation).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fail-fast", action="store_true",
                    help="stop at the first failing file")
    args, extra = ap.parse_known_args(argv)

    files = sorted((REPO / "tests").glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    t_all = time.time()
    failures: list[tuple[str, int]] = []
    for f in files:
        rel = f.relative_to(REPO)
        print(f"=== {rel}", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", str(rel), "-q"] + extra,
            cwd=REPO,
        )
        dt = time.time() - t0
        if proc.returncode != 0:
            # Negative rc = killed by signal (the round-3 failure mode):
            # report it loudly but keep going so one crash maps to one
            # file, not an aborted gate.
            how = (f"signal {-proc.returncode}" if proc.returncode < 0
                   else f"rc {proc.returncode}")
            print(f"=== {rel} FAILED ({how}) in {dt:.0f}s", flush=True)
            failures.append((str(rel), proc.returncode))
            if args.fail_fast:
                break
        else:
            print(f"=== {rel} ok in {dt:.0f}s", flush=True)
    total = time.time() - t_all
    if failures:
        print(f"FAILED files ({len(failures)}/{len(files)}, "
              f"{total:.0f}s total):")
        for rel, rc in failures:
            print(f"  {rel} (rc {rc})")
        return 1
    print(f"all {len(files)} test files passed in {total:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
