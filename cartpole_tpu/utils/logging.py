"""Structured JSON solve logs + human-readable solver summaries.

Format parity with the reference's observability surface: the per-solve JSON
written by the web app's "Save log" button (ring buffer of 5000
``OptimizationOutputs.toJson()`` payloads,
``/root/reference/viz/src/application.ts:344-351,429-434``; serializer field
names from ``optimization/wasm.cc:46-65,19-28``) and the human summary
exposed as ``getLog`` / Python ``solver_summary()``
(``wasm.cc:89``, ``wrapper/wrapper.cc:82-83``).
"""

from __future__ import annotations

import collections
import json
from typing import Any, Iterable, List, Optional

import numpy as np

from ..ops.solver import NLSOutputs, termination_state_name

__all__ = ["solve_log_entry", "solver_summary", "SolveLog"]


def _state_dict(x: np.ndarray) -> dict:
    x = np.asarray(x)
    if x.shape[-1] == 4:
        # Reference field order is [b_x, th_1, th_1_dot, b_x_dot] in JSON but
        # the state vector is [b_x, th_1, b_x_dot, th_1_dot] (structs.hpp:44-64).
        return {
            "b_x": _finite(x[0]),
            "th_1": _finite(x[1]),
            "th_1_dot": _finite(x[3]),
            "b_x_dot": _finite(x[2]),
        }
    return {"x": [_finite(v) for v in x]}


def _finite(v) -> Optional[float]:
    """float(v), or None when non-finite: json.dumps would emit literal
    NaN/Infinity tokens that RFC-compliant parsers (JSON.parse, the consumer
    of the reference's "Save log" format) reject, poisoning the whole file.
    Failed solves legitimately produce non-finite cost/first_order_norm
    (ops/solver.py)."""
    v = float(np.asarray(v))
    return v if np.isfinite(v) else None


def _solver_dict(solver: NLSOutputs) -> dict:
    def arr(a):
        a = np.asarray(a)
        return [None if not np.isfinite(v) else float(v) for v in a]

    return {
        "termination_state": termination_state_name(
            int(np.asarray(solver.termination_state))
        ),
        "n_iterations": int(np.asarray(solver.n_iterations)),
        "cost": _finite(solver.cost),
        "constraint_violation": _finite(solver.constraint_violation),
        "first_order_norm": _finite(solver.first_order_norm),
        "lambda": _finite(solver.lambda_final),
        "iterations": {
            "cost": arr(solver.iter_cost),
            "constraint_violation": arr(solver.iter_violation),
            "lambda": arr(solver.iter_lambda),
            "step_size": arr(solver.iter_step_size),
            "first_order_norm": arr(solver.iter_first_order),
        },
    }


def solve_log_entry(outputs: Any) -> dict:
    """One ``MPCOutputs`` -> the reference's ``OptimizationOutputs`` JSON
    shape (``wasm.cc:57-64``: initial_state, previous_solution,
    solver_outputs, u, predicted_states)."""
    return {
        "initial_state": _state_dict(np.asarray(outputs.initial_state)),
        "previous_solution": [
            _finite(v) for v in np.asarray(outputs.previous_solution)
        ],
        "solver_outputs": _solver_dict(outputs.solver),
        "u": [_finite(v) for v in np.asarray(outputs.u)],
        "predicted_states": [
            _state_dict(s) for s in np.asarray(outputs.predicted_states)
        ],
    }


def solver_summary(solver: NLSOutputs) -> str:
    """Human-readable per-iteration table — the ``NLSSolverOutputs.ToString()``
    analog surfaced as ``solver_summary()`` in the Python API."""
    lines = [
        "termination = {}, iterations = {}, cost = {:.6e}, "
        "|c|_inf = {:.3e}, |grad L|_inf = {:.3e}".format(
            termination_state_name(int(np.asarray(solver.termination_state))),
            int(np.asarray(solver.n_iterations)),
            float(np.asarray(solver.cost)),
            float(np.asarray(solver.constraint_violation)),
            float(np.asarray(solver.first_order_norm)),
        )
    ]
    costs = np.asarray(solver.iter_cost)
    viols = np.asarray(solver.iter_violation)
    lams = np.asarray(solver.iter_lambda)
    alphas = np.asarray(solver.iter_step_size)
    firsts = np.asarray(solver.iter_first_order)
    for i in range(costs.shape[0]):
        if not np.isfinite(costs[i]):
            break
        lines.append(
            "  iter {:2d}: cost = {:.6e}, |c|_inf = {:.3e}, lambda = {:.1e}, "
            "alpha = {:.4f}, |grad|_inf = {:.3e}".format(
                i,
                float(costs[i]),
                float(viols[i]),
                float(lams[i]),
                float(alphas[i]),
                float(firsts[i]),
            )
        )
    return "\n".join(lines)


class SolveLog:
    """Bounded ring buffer of solve logs (cap matches the web app's 5000,
    ``application.ts:431-434``), savable as one JSON document."""

    def __init__(self, capacity: int = 5000) -> None:
        self._buf: collections.deque = collections.deque(maxlen=capacity)

    def __len__(self) -> int:
        return len(self._buf)

    def append(self, outputs: Any) -> None:
        self._buf.append(solve_log_entry(outputs))

    def extend_batched(self, outputs: Any, indices: Optional[Iterable[int]] = None):
        """Append entries from a batched ``MPCOutputs`` (leading batch axis)."""
        import jax

        # Pull each leaf to the host ONCE; indexing per appended entry would
        # re-transfer the full batched array every iteration (~35 MB/s link).
        host = jax.tree.map(np.asarray, outputs)
        n = host.u.shape[0]
        for i in indices if indices is not None else range(n):
            self.append(jax.tree.map(lambda leaf: leaf[i], host))

    def entries(self) -> List[dict]:
        return list(self._buf)

    def to_json(self) -> str:
        return json.dumps(self.entries())

    def save(self, path: str) -> None:
        """Write ``log.json`` (the "Save log" button analog)."""
        with open(path, "w") as f:
            f.write(self.to_json())
