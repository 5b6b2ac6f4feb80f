"""Pallas TPU kernels for the solver hot path.

One fused, gridless kernel computes the multiple-shooting segment rollout
AND its Jacobians for the whole flattened (batch x segment) axis with the
batch in the TPU lane dimension: every dynamics operation runs on full
(1, R)-shaped lanes, and the RK4 chain rule is unrolled into scalar
component arithmetic — no (B, sd, sd) intermediates, whose minor-dim
padding to (8, 128) tiles costs ~64x HBM traffic in the vmapped version.

Gridless by necessity: this runtime's Pallas pipeline compiles whole-array
kernels quickly but hangs on ``grid=`` kernels, so the caller chunks the
flattened axis and emits one ``pallas_call`` per chunk.

STATUS: interpret-validated (tests/test_pallas_kernel.py) and
compile-validated on v5e (3e-8 max err vs the chain-rule reference), but
NOT wired into the MPC hot path — measured head-to-head at the hot-path
shape (R=32768 flattened batch x segment, T=5, f32, scan of 50 in one
jit) the kernel runs 0.871 ms/iter vs 0.949 ms/iter for the pure-XLA
structure-of-arrays path (``ops/lanes.segment_rollout_with_jac_scan``)
that now feeds the condensed solver: only ~8% — XLA's fusion of the SoA
rows layout already sits at the kernel's memory-bound floor, so the extra
compile-reliability risk (CLAUDE.md: tunnel Mosaic compiles are
nondeterministically slow/hung in some processes) buys almost nothing.
Kept as the integration blueprint for runtimes where Pallas wins: wrap
with ``jax.custom_batching.custom_vmap`` in ``mpc/problem.py`` so
per-instance tracing keeps the chain-rule path and the vmapped rule
reshapes to batch-last and calls this kernel.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["segment_jac_batch_last", "PALLAS_CHUNK"]

#: Lanes per pallas call; bounds VMEM residency (~6 MB at 16384 for sd=4).
PALLAS_CHUNK = 16384


def _mm(A, B, sd):
    """(sd, sd) matrix product over component lists of (1, R) arrays."""
    return [
        [sum(A[i][l] * B[l][j] for l in range(sd)) for j in range(sd)]
        for i in range(sd)
    ]


def _mv(A, v, sd):
    return [sum(A[i][l] * v[l] for l in range(sd)) for i in range(sd)]


def _rk4_jac_components(fj, x, u, h, sd):
    """One RK4 step + chain-rule Jacobians on component lists.

    ``x``: list of sd (1, R) arrays; ``u``: (1, R). ``fj(x_list, u) ->
    (xdot list, A nested list, B list)``. Mirrors
    ``ops/integrate.rk4_step_with_jac``.
    """
    def eye_plus(scale, M):
        return [
            [(1.0 if i == j else 0.0) + scale * M[i][j] for j in range(sd)]
            for i in range(sd)
        ]

    k1, A1, B1 = fj(x, u)
    x2 = [x[i] + k1[i] * (h * 0.5) for i in range(sd)]
    k2, A2, B2 = fj(x2, u)
    dk2x = _mm(A2, eye_plus(h * 0.5, A1), sd)
    dk2u = [a + b for a, b in zip(_mv(A2, [(h * 0.5) * v for v in B1], sd), B2)]
    x3 = [x[i] + k2[i] * (h * 0.5) for i in range(sd)]
    k3, A3, B3 = fj(x3, u)
    dk3x = _mm(A3, eye_plus(h * 0.5, dk2x), sd)
    dk3u = [a + b for a, b in zip(_mv(A3, [(h * 0.5) * v for v in dk2u], sd), B3)]
    x4 = [x[i] + k3[i] * h for i in range(sd)]
    k4, A4, B4 = fj(x4, u)
    dk4x = _mm(A4, eye_plus(h, dk3x), sd)
    dk4u = [a + b for a, b in zip(_mv(A4, [h * v for v in dk3u], sd), B4)]

    xn = [
        x[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i])
        for i in range(sd)
    ]
    A = [
        [
            (1.0 if i == j else 0.0)
            + (h / 6.0) * (A1[i][j] + 2.0 * dk2x[i][j] + 2.0 * dk3x[i][j]
                           + dk4x[i][j])
            for j in range(sd)
        ]
        for i in range(sd)
    ]
    B = [
        (h / 6.0) * (B1[i] + 2.0 * dk2u[i] + 2.0 * dk3u[i] + dk4u[i])
        for i in range(sd)
    ]
    return xn, A, B


def _make_kernel(gen_jac, n_params: int, sd: int, sp: int, h: float,
                 angle_indices: Tuple[int, ...]):
    from ..ops.integrate import mod_pi

    # All values inside the kernel are (1, chunk) 2-D slices — TPU pallas
    # wants >=2-D operands; the generated dynamics modules broadcast over
    # trailing axes so a stacked (sd, 1, chunk) view feeds them directly.
    def kernel(p_ref, x_ref, u_ref, xe_ref, jx_ref, ju_ref):
        params = tuple(p_ref[i : i + 1, :] for i in range(n_params))

        def fj_bound(x_list, u):
            xa = jnp.stack(x_list)
            xd, Jx, Ju = gen_jac(params, xa, u)
            return (
                [xd[i] for i in range(sd)],
                [[Jx[i, j] for j in range(sd)] for i in range(sd)],
                [Ju[i] for i in range(sd)],
            )

        x = [x_ref[i : i + 1, :] for i in range(sd)]
        Jx = [
            [jnp.ones_like(x[0]) if i == j else jnp.zeros_like(x[0])
             for j in range(sd)]
            for i in range(sd)
        ]
        Ju_cols = [None] * sp
        for k in range(sp):
            x, A, B = _rk4_jac_components(
                fj_bound, x, u_ref[k : k + 1, :], h, sd
            )
            x = list(x)
            for a in angle_indices:
                x[a] = mod_pi(x[a])
            Jx = _mm(A, Jx, sd)
            for j in range(k):
                Ju_cols[j] = _mv(A, Ju_cols[j], sd)
            Ju_cols[k] = B
        for i in range(sd):
            xe_ref[i : i + 1, :] = x[i]
            for j in range(sd):
                jx_ref[i * sd + j : i * sd + j + 1, :] = Jx[i][j]
            for k in range(sp):
                ju_ref[i * sp + k : i * sp + k + 1, :] = Ju_cols[k][i]

    return kernel


def segment_jac_batch_last(
    gen_jac: Callable,
    params_cols,
    xs_cols,
    us_cols,
    h: float,
    angle_indices: Tuple[int, ...],
    interpret: bool = False,
):
    """Fused segment rollout + Jacobians, batch-last.

    Args:
      gen_jac: machine-generated ``(params_tuple, x, u) -> (xd, Jx, Ju)``
        (broadcasts over trailing axes).
      params_cols: (n_params, R) — dynamics params broadcast per column.
      xs_cols: (sd, R) segment start states.
      us_cols: (sp, R) segment controls.
      h: integration step.
      interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
      ``(x_end (sd, R), Jx (sd, sd, R), Ju (sd, sp, R))``.
    """
    from jax.experimental import pallas as pl

    n_params, R = params_cols.shape
    sd = xs_cols.shape[0]
    sp = us_cols.shape[0]
    dtype = xs_cols.dtype

    kernel = _make_kernel(gen_jac, n_params, sd, sp, h, angle_indices)

    chunk = min(PALLAS_CHUNK, R)
    if R % chunk != 0:
        # One call over the whole (unchunked) axis; R is lane-padded by
        # the caller to a multiple of 128 already.
        chunk = R
    n_chunks = R // chunk

    def call(p, x, u):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((sd, chunk), dtype),
                jax.ShapeDtypeStruct((sd * sd, chunk), dtype),
                jax.ShapeDtypeStruct((sd * sp, chunk), dtype),
            ),
            interpret=interpret,
        )(p, x, u)

    xe_parts, jx_parts, ju_parts = [], [], []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        xe, jxf, juf = call(
            params_cols[:, sl], xs_cols[:, sl], us_cols[:, sl]
        )
        xe_parts.append(xe)
        jx_parts.append(jxf)
        ju_parts.append(juf)

    x_end = jnp.concatenate(xe_parts, axis=-1)
    Jx = jnp.concatenate(jx_parts, axis=-1).reshape(sd, sd, R)
    Ju = jnp.concatenate(ju_parts, axis=-1).reshape(sd, sp, R)
    return x_end, Jx, Ju
