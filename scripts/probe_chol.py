"""Micro-probe: where the 20 ms KKT phase goes at (B=4096, K=40)."""

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

B, K, reps = 4096, 40, 20
dtype = jnp.float32


def timed(fn, args, label):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    best = math.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {best/reps*1e3:9.3f} ms/call", flush=True)


rng = np.random.RandomState(0)
A = rng.randn(B, K, K).astype(np.float32)
H = jnp.asarray(np.einsum("bij,bkj->bik", A, A) + 10 * np.eye(K)[None])
rhs = jnp.asarray(rng.randn(B, K, 4).astype(np.float32))
tj = jnp.asarray(rng.randn(1, K, B).astype(np.float32))


def chol_only(H):
    def body(c, _):
        L = jnp.linalg.cholesky(c)
        return c + 0.0 * L, None
    c, _ = jax.lax.scan(body, H, None, length=reps)
    return c


def chol_solve(H, rhs):
    def body(carry, _):
        H_, r_ = carry
        L = jnp.linalg.cholesky(H_)
        s = jax.scipy.linalg.cho_solve((L, True), r_)
        return (H_ + 0.0 * s[..., :1] * 0.0, r_ + 0.0 * s), None
    (H2, r2), _ = jax.lax.scan(body, (H, rhs), None, length=reps)
    return r2


def direct_solve(H, rhs):
    def body(carry, _):
        H_, r_ = carry
        s = jnp.linalg.solve(H_, r_)
        return (H_, r_ + 0.0 * s), None
    (H2, r2), _ = jax.lax.scan(body, (H, rhs), None, length=reps)
    return r2


def h_build(tj):
    Hu = jnp.asarray(np.eye(K).astype(np.float32))
    def body(c, _):
        Ht = jnp.sum(c[:, :, None, :] * c[:, None, :, :], axis=0) \
            + Hu[:, :, None]
        Hb = jnp.transpose(Ht, (2, 0, 1))
        return c + 0.0 * Hb[0, 0, 0], None
    c, _ = jax.lax.scan(body, tj, None, length=reps)
    return c


def unrolled_chol_lanes(Hl):
    """Batch-last unrolled Cholesky: H (K, K, B) -> L lower (K, K, B)."""
    def chol(Hx):
        col = [[None] * K for _ in range(K)]
        for j in range(K):
            acc = Hx[j, j]
            for t in range(j):
                acc = acc - col[j][t] * col[j][t]
            d = jnp.sqrt(acc)
            col[j][j] = d
            inv = 1.0 / d
            for i in range(j + 1, K):
                acc = Hx[i, j]
                for t in range(j):
                    acc = acc - col[i][t] * col[j][t]
                col[i][j] = acc * inv
        return col

    def body(c, _):
        col = chol(c)
        return c + 0.0 * col[K - 1][K - 1], None
    c, _ = jax.lax.scan(body, Hl, None, length=reps)
    return c


with jax.default_matmul_precision("float32"):
    timed(h_build, (tj,), "H build + transpose")
    timed(chol_only, (H,), "cholesky (B,K,K)")
    timed(chol_solve, (H, rhs), "cholesky + cho_solve")
    timed(direct_solve, (H, rhs), "jnp.linalg.solve")
    Hl = jnp.transpose(H, (1, 2, 0))
    timed(unrolled_chol_lanes, (Hl,), "unrolled lanes cholesky")
