"""The MPC controller: functional analog of ``pendulum::Optimization``.

Capability parity with ``/root/reference/optimization/optimization.{hpp,cc}``
(``Step`` / ``Reset`` / ``SetPreviousSolution``), re-designed the JAX way: the
reference's mutable ``Optimization`` object becomes a static ``MPC`` config
object plus an explicit ``MPCState`` PyTree the caller carries between steps
(warm-start state == resumable/checkpointable state, SURVEY.md §5). ``step``
is a pure function: jit it, ``vmap`` it over thousands of scenario instances,
``shard_map`` it over a device mesh.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax.numpy as jnp

from ..models.base import CartPoleModel, SINGLE_CARTPOLE
from ..ops.integrate import rollout
from ..ops.solver import (
    NLSConfig,
    NLSOutputs,
    NLSProblem,
    NLSTerminationState,
    solve_nls,
)
from .config import OptimizationParams
from .problem import MPCProblemSpec

__all__ = ["MPC", "MPCState", "MPCOutputs", "make_mpc"]


class MPCState(NamedTuple):
    """Carried warm-start state (the reference's ``previous_solution_``,
    ``optimization.hpp:107``)."""

    previous_solution: Any  #: (dim,) decision vector from the last solve.
    warm: Any  #: bool scalar — whether previous_solution is valid.


class MPCOutputs(NamedTuple):
    """Analog of ``OptimizationOutputs`` (``optimization.hpp:55-70``)."""

    initial_state: Any  #: (state_dim,) state the window was solved from.
    previous_solution: Any  #: (dim,) the initial guess used for this solve.
    solver: NLSOutputs  #: solver diagnostics.
    u: Any  #: (window_length,) optimized control sequence.
    predicted_states: Any  #: (window_length, state_dim) open-loop prediction.
    solution: Any  #: (dim,) full decision vector at the solution.


class MPC:
    """Static MPC definition; all methods are pure functions.

    Build with :func:`make_mpc`. ``step`` has the same signature semantics as
    ``Optimization::Step(current_state, dynamics_params, b_x_set_point)``
    (``optimization.hpp:78-80``) with the warm-start state made explicit.
    """

    def __init__(self, params: OptimizationParams, model: CartPoleModel = SINGLE_CARTPOLE):
        self.params = params
        self.model = model
        self.spec = MPCProblemSpec(params, model)
        self.nls_config = NLSConfig(
            max_iterations=params.max_iterations,
            max_line_search_iterations=params.max_line_search_iterations,
            relative_exit_tol=params.relative_exit_tol,
            absolute_first_derivative_tol=params.absolute_first_derivative_tol,
            equality_penalty_initial=params.equality_penalty_initial,
            kkt_method=params.kkt_method,
        )

    # ------------------------------------------------------------------ state
    def init_state(self, dtype=jnp.float32) -> MPCState:
        """Cold-start state (the ``Reset()`` analog, ``optimization.hpp:83``)."""
        return MPCState(
            previous_solution=jnp.zeros((self.spec.dim,), dtype),
            warm=jnp.zeros((), bool),
        )

    def reset(self, state: MPCState) -> MPCState:
        return self.init_state(state.previous_solution.dtype)

    def reset_where(self, state: MPCState, mask) -> MPCState:
        """Discard warm starts where ``mask`` is True (batched ``Reset()``:
        the reference UI resets a poisoned warm start when re-enabling the
        controller, ``application.ts:209-214``; at batch scale the per-
        instance failure detector drives this — SURVEY.md §5 failure
        handling)."""
        mask = jnp.asarray(mask)
        return MPCState(
            previous_solution=jnp.where(
                mask[..., None], jnp.zeros_like(state.previous_solution),
                state.previous_solution,
            ),
            warm=jnp.where(mask, jnp.zeros_like(state.warm), state.warm),
        )

    def set_previous_solution(self, state: MPCState, guess) -> MPCState:
        """``SetPreviousSolution`` analog (``optimization.hpp:86-89``)."""
        guess = jnp.asarray(guess, state.previous_solution.dtype)
        return MPCState(previous_solution=guess, warm=jnp.ones((), bool))

    def failure_mask(self, outputs: "MPCOutputs"):
        """Per-instance failure detector: solver termination in
        {QP_INDEFINITE, MAX_LAMBDA} (the health invariant of
        ``optimization_test.cc:44-46``) or a non-finite solution. Feed to
        :meth:`reset_where` to discard poisoned warm starts."""
        term = outputs.solver.termination_state
        bad = (term == NLSTerminationState.QP_INDEFINITE) | (
            term == NLSTerminationState.MAX_LAMBDA
        )
        finite = jnp.all(jnp.isfinite(outputs.solution), axis=-1)
        return bad | ~finite

    def knockdown_mask(self, x, angle_threshold: float = 0.5):
        """Per-instance PLANT-state knockdown detector: any pole angle more
        than ``angle_threshold`` rad from upright. Complements
        :meth:`failure_mask` (solver health): a knocked-down instance
        usually has perfectly healthy solves — the plant just fell over.
        ``x`` is ``(..., state_dim)``; returns a ``(...,)`` bool mask.

        Measured characterization of the double-pole bench regime
        (scripts/probe_knockdowns.py, knockdowns.json): the cold-start
        transient knocks ~2% of 4096 instances down; most self-recover by
        tick 500, and the residual stuck set responds to NO intervention
        at u_limit 300 (sinusoid warm-start kicks recover fewer than the
        do-nothing control) — so the product answer is detection +
        reporting, not an automatic kick."""
        from ..ops.integrate import mod_pi

        x = jnp.asarray(x)
        th = x[..., jnp.asarray(self.model.angle_indices)]
        err = mod_pi(th - math.pi / 2)
        return jnp.any(jnp.abs(err) > angle_threshold, axis=-1)

    def knockdown_report(self, states, angle_threshold: float = 0.5,
                         stuck_after: int = 100):
        """Offline knockdown analysis of a recorded closed-loop trajectory
        ``states`` ``(B, T, state_dim)`` (``ClosedLoopResult.states``).

        Returns ``(down, first_down_tick, stuck)``:

        - ``down`` ``(B, T)`` bool — per-tick knockdown mask;
        - ``first_down_tick`` ``(B,)`` int32 — first knocked-down tick, or
          ``-1`` if the instance never went down;
        - ``stuck`` ``(B,)`` bool — down for the final ``stuck_after``
          consecutive ticks (the unrecoverable set at u_limit 300; see
          scripts/probe_knockdown_reachability.py for the quantified
          reachability evidence).
        """
        down = self.knockdown_mask(states, angle_threshold)  # (B, T)
        T = down.shape[-1]
        ever = jnp.any(down, axis=-1)
        first = jnp.where(ever, jnp.argmax(down, axis=-1), -1).astype(
            jnp.int32
        )
        tail = min(stuck_after, T)
        stuck = jnp.all(down[..., T - tail:], axis=-1)
        return down, first, stuck

    # ------------------------------------------------------------------- guess
    def _initial_guess(self, state: MPCState, x_current):
        """Warm start (shift controls one step, optimization.cc:50-57) or
        sinusoidal cold start (:61-67), then fill the shooting states by
        rolling the guessed controls out from the current state (:333-351 —
        the reference runs this fill unconditionally)."""
        spec = self.spec
        dtype = x_current.dtype
        K = spec.window_length
        u0 = spec.u_start

        z_prev = state.previous_solution.astype(dtype)
        u_prev = z_prev[u0:]
        u_warm = jnp.concatenate([u_prev[1:], u_prev[-1:]])

        k = jnp.arange(K, dtype=dtype)
        u_cold = self.params.u_guess_sinusoid_amplitude * jnp.sin(
            k / K * (2.0 * math.pi)
        )

        u_guess = jnp.where(state.warm, u_warm, u_cold)
        u_prev_continuity = jnp.where(state.warm, u_prev[0], jnp.zeros((), dtype))
        return u_guess, u_prev_continuity

    # -------------------------------------------------------------------- step
    def step(self, state: MPCState, x_current, dynamics_params, b_x_set_point=0.0):
        """Run one receding-horizon solve. Pure; vmap over the leading axis of
        ``(state, x_current, dynamics_params, b_x_set_point)`` for batching.

        Returns ``(MPCOutputs, MPCState)``.
        """
        spec = self.spec
        x_current = jnp.asarray(x_current)
        dtype = x_current.dtype
        set_point = jnp.asarray(b_x_set_point, dtype)

        u_guess, u_prev_continuity = self._initial_guess(state, x_current)

        f = lambda x, u: self.model.dynamics(dynamics_params, x, u)
        _, xs_roll = rollout(
            f, x_current, u_guess, self.params.control_dt, self.model.angle_indices
        )
        # Shooting-state guesses: x_current plus every spacing-th rolled state.
        shoot = jnp.concatenate(
            [x_current[None, :], xs_roll[spec.spacing - 1 :: spec.spacing]], axis=0
        )
        z_guess = jnp.concatenate([shoot.reshape(-1), u_guess])

        linearize, evaluate, retract = spec.make_problem_fns(
            x_current, set_point, u_prev_continuity, dynamics_params
        )
        condensed = (
            spec.make_condensed_step(
                x_current, set_point, u_prev_continuity, dynamics_params
            )
            if self.params.kkt_method == "condensed"
            else None
        )
        problem = NLSProblem(
            linearize=linearize,
            evaluate=evaluate,
            retract=retract,
            condensed_step=condensed,
        )
        z_sol, solver_outputs = solve_nls(problem, z_guess, self.nls_config)

        u_out = z_sol[spec.u_start :]
        _, predicted = rollout(
            f, x_current, u_out, self.params.control_dt, self.model.angle_indices
        )

        outputs = MPCOutputs(
            initial_state=x_current,
            previous_solution=z_guess,
            solver=solver_outputs,
            u=u_out,
            predicted_states=predicted,
            solution=z_sol,
        )
        new_state = MPCState(previous_solution=z_sol, warm=jnp.ones((), bool))
        return outputs, new_state


def make_mpc(
    params: OptimizationParams | None = None,
    model: CartPoleModel = SINGLE_CARTPOLE,
) -> MPC:
    """Construct an MPC controller definition (static; reusable across jit)."""
    return MPC(params or OptimizationParams(), model)
