"""Debug mode: the sanitizer / ``F_ASSERT`` story for a JAX program.

The reference runs two layers of runtime checking: ``F_ASSERT_*`` guards on
every boundary (``/root/reference/optimization/optimization.cc:14-21``,
``simulator.cc:13-14``, ``wasm.cc:76-101``) and ASAN/UBSAN-style sanitizer
builds in CI. In a compiled XLA program neither exists as-is — a NaN does
not trap, it silently propagates, and the production solver deliberately
*masks* non-finite instances instead of stopping (``MPC.failure_mask``).
This module is the opt-in developer-facing counterpart for when you want to
STOP and see where a bad value was born:

* :func:`debug_mode` — context manager flipping ``jax_debug_nans`` /
  ``jax_debug_infs``: any NaN/Inf produced under ``jit`` re-runs the
  offending computation op-by-op and raises with the originating primitive
  (the closest JAX analog of a sanitizer build).
* :func:`checked` — wraps a function with ``jax.experimental.checkify``
  (float + index + div checks), keeping it jittable; the returned wrapper
  raises :class:`DebugCheckError` with the first failed check's message and
  source location. Works inside ``lax.scan``/``while_loop``, where
  ``jax_debug_nans`` cannot point at the culprit.
* :func:`assert_all_finite` — host-side boundary assert for PyTrees
  (states, warm starts, checkpoints) reporting the exact tree paths of
  offending leaves — the ``F_ASSERT(std::isfinite(u))`` analog for whole
  solver states.

None of this runs in production paths: the hot program stays check-free and
the failure surface there remains the vectorized ``failure_mask`` +
``reset_where`` machinery (``tests/test_failure_handling.py``).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp

__all__ = [
    "DebugCheckError",
    "assert_all_finite",
    "checked",
    "debug_mode",
    "leak_check",
]


class DebugCheckError(AssertionError):
    """A checkify/finite assertion failed inside a debug-mode run."""


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = True) -> Iterator[None]:
    """Enable JAX's NaN/Inf debugging inside the scope, restoring after.

    Under this scope any jitted computation that produces a NaN (or Inf
    with ``infs=True``) is re-run in op-by-op mode and raises
    ``FloatingPointError`` naming the primitive that produced it. Compile
    caches are keyed on these flags, so entering the scope forces a
    recompile of anything called inside — use on small repros, not on the
    bench loop.
    """
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", bool(nans))
    jax.config.update("jax_debug_infs", bool(infs))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def checked(fn: Callable[..., Any]) -> Callable[..., Any]:
    """Wrap ``fn`` with checkify float/index/div error instrumentation.

    The instrumented function is jit-compiled internally (checks become
    in-graph error state, the XLA program stays one compiled unit); the
    wrapper raises :class:`DebugCheckError` host-side if any check fired,
    with the first failure's message and source location. Call the wrapper
    at the top level — do not place it under another ``jit``. This is the
    debug build of a solver step: NaN births inside ``lax.scan``
    iterations are caught at the op that made them.
    """
    from jax.experimental import checkify

    errs = checkify.float_checks | checkify.index_checks | checkify.div_checks
    checked_fn = jax.jit(checkify.checkify(fn, errors=errs))

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        try:
            checkify.check_error(err)
        except Exception as e:  # noqa: BLE001 - normalize checkify's type
            raise DebugCheckError(str(e)) from None
        return out

    wrapper.__name__ = getattr(fn, "__name__", "checked")
    wrapper.__doc__ = fn.__doc__
    return wrapper


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Host-side ``F_ASSERT(isfinite(...))`` over every leaf of a PyTree.

    Raises :class:`DebugCheckError` listing the tree path, dtype, shape and
    bad-entry count of every offending leaf. Intended at module boundaries:
    plant states entering the MPC, warm starts loaded from a checkpoint,
    controls handed to the simulator.
    """
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            continue
        n_bad = int(jnp.sum(~jnp.isfinite(arr)))
        if n_bad:
            bad.append(
                f"  {name}{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} "
                f"non-finite ({arr.dtype}, shape {arr.shape})"
            )
    if bad:
        raise DebugCheckError(
            f"non-finite values in '{name}':\n" + "\n".join(bad)
        )


def leak_check(baseline=None) -> dict:
    """Report live device arrays — the ``doLeakCheck`` analog.

    The reference exports ``__lsan_do_recoverable_leak_check`` to the
    browser (``wasm.cc:140-144``) and manually deletes embind objects so
    LSan runs clean (``application.ts:123-130, 456``). The JAX equivalent
    of "leaked objects" is device buffers kept alive by stray references
    (a logging list holding whole batched outputs, a closure pinning a
    sweep's worth of warm starts). Returns ``{"count", "nbytes",
    "by_shape"}`` for live committed arrays. ``baseline`` may be a
    previous ``leak_check()`` report (count, nbytes, AND per-shape counts
    are all reported as deltas beyond it — a leak-free loop after a heavy
    setup reads as zeros) or a bare int (legacy: count delta only).
    Call once after setup to get the baseline, again after a work loop to
    see what accumulated.
    """
    arrs = [a for a in jax.live_arrays() if not a.is_deleted()]
    by_shape: dict = {}
    for a in arrs:
        key = f"{a.dtype}{list(a.shape)}"
        by_shape[key] = by_shape.get(key, 0) + 1
    nbytes = int(sum(a.nbytes for a in arrs))
    count = len(arrs)
    if isinstance(baseline, dict):
        count -= baseline.get("count", 0)
        nbytes -= baseline.get("nbytes", 0)
        for key, n in baseline.get("by_shape", {}).items():
            by_shape[key] = by_shape.get(key, 0) - n
        by_shape = {k: v for k, v in by_shape.items() if v > 0}
    elif baseline:
        count -= int(baseline)
    return {
        "count": max(0, count),
        "nbytes": max(0, nbytes),
        "by_shape": dict(
            sorted(by_shape.items(), key=lambda kv: -kv[1])[:20]
        ),
    }
