"""ctypes bindings for the native C++ parity oracle (``native/oracle.cc``).

The build-on-first-use shared library plays the role ``pypendulum`` plays in
the reference's Python surface (``wrapper/wrapper.cc``): a host-native
implementation of dynamics / RK4 / 1 kHz plant / closed-loop MPC that the
JAX stack is tested against. Compiled with ``g++ -O2`` into
``native/_build/liboracle.so`` and cached; rebuilt when the source changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

from .mpc.config import OptimizationParams

__all__ = [
    "is_available",
    "oracle_dynamics",
    "oracle_rk4",
    "oracle_sim_step",
    "oracle_double_dynamics",
    "oracle_double_sim_step",
    "oracle_closed_loop",
]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "oracle.cc"
_BUILD_DIR = _NATIVE_DIR / "_build"

_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build() -> pathlib.Path:
    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    out = _BUILD_DIR / f"liboracle-{src_hash}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
         "-o", str(out), str(_SRC)],
        check=True,
        capture_output=True,
        text=True,
    )
    return out


def _get_lib() -> ctypes.CDLL:
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if _lib_error is not None:
        raise RuntimeError(f"native oracle unavailable: {_lib_error}")
    try:
        lib = ctypes.CDLL(str(_build()))
    except (subprocess.CalledProcessError, OSError) as e:
        _lib_error = getattr(e, "stderr", None) or str(e)
        raise RuntimeError(f"native oracle build failed: {_lib_error}") from e

    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.co_single_dynamics.argtypes = [dbl_p, dbl_p, ctypes.c_double, dbl_p, dbl_p, dbl_p]
    lib.co_single_dynamics.restype = None
    lib.co_single_rk4.argtypes = [dbl_p, dbl_p, ctypes.c_double, ctypes.c_double, dbl_p]
    lib.co_single_rk4.restype = None
    lib.co_single_sim_step.argtypes = [
        dbl_p, dbl_p, ctypes.c_double, ctypes.c_double, dbl_p, dbl_p, dbl_p
    ]
    lib.co_single_sim_step.restype = None
    lib.co_single_closed_loop.argtypes = [
        dbl_p, dbl_p, ctypes.c_double, dbl_p, ctypes.c_int, dbl_p, dbl_p
    ]
    lib.co_single_closed_loop.restype = ctypes.c_int
    lib.co_double_dynamics.argtypes = [
        dbl_p, dbl_p, ctypes.c_double, dbl_p, dbl_p, dbl_p, dbl_p
    ]
    lib.co_double_dynamics.restype = None
    lib.co_double_sim_step.argtypes = [
        dbl_p, dbl_p, ctypes.c_double, ctypes.c_double, dbl_p
    ]
    lib.co_double_sim_step.restype = None
    _lib = lib
    return lib


def is_available() -> bool:
    """True if the toolchain is present and the oracle builds."""
    try:
        _get_lib()
        return True
    except RuntimeError:
        return False


def _as_c(a) -> Tuple[np.ndarray, ctypes.POINTER(ctypes.c_double)]:
    arr = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _params_vec(params) -> np.ndarray:
    return np.array(
        [float(v) for v in params.as_dict().values()], dtype=np.float64
    )


def _opt_vec(p: OptimizationParams) -> np.ndarray:
    return np.array(
        [
            p.control_dt, p.window_length, p.state_spacing, p.max_iterations,
            p.relative_exit_tol, p.absolute_first_derivative_tol,
            p.equality_penalty_initial, p.u_guess_sinusoid_amplitude,
            p.u_cost_weight, p.u_derivative_cost_weight,
            p.b_x_final_cost_weight, p.th_final_cost_weight,
            p.b_x_dot_final_cost_weight, p.th_dot_final_cost_weight,
            p.b_x_limit, p.u_limit, p.max_line_search_iterations,
        ],
        dtype=np.float64,
    )


def oracle_dynamics(params, x, u, f_base=None, f_mass=None) -> np.ndarray:
    """Native ``x_dot = f(x, u)`` for the single cart-pole."""
    lib = _get_lib()
    _, pp = _as_c(_params_vec(params))
    _, xp = _as_c(x)
    fb = _as_c(f_base)[1] if f_base is not None else None
    fm = _as_c(f_mass)[1] if f_mass is not None else None
    out = np.zeros(4)
    lib.co_single_dynamics(pp, xp, float(u), fb, fm,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def oracle_rk4(params, x, u, h) -> np.ndarray:
    """Native single RK4 step (no angle wrap)."""
    lib = _get_lib()
    _, pp = _as_c(_params_vec(params))
    _, xp = _as_c(x)
    out = np.zeros(4)
    lib.co_single_rk4(pp, xp, float(u), float(h),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def oracle_sim_step(params, x, dt, u, f_base=None, f_mass=None) -> np.ndarray:
    """Native 1 kHz-substep plant integration."""
    lib = _get_lib()
    _, pp = _as_c(_params_vec(params))
    _, xp = _as_c(x)
    fb = _as_c(f_base)[1] if f_base is not None else None
    fm = _as_c(f_mass)[1] if f_mass is not None else None
    out = np.zeros(4)
    lib.co_single_sim_step(pp, xp, float(dt), float(u), fb, fm,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def oracle_double_dynamics(
    params, x, u, f_base=None, f_mass=None, f_mass_2=None
) -> np.ndarray:
    """Native ``x_dot = f(x, u)`` for the double cart-pole."""
    lib = _get_lib()
    _, pp = _as_c(_params_vec(params))
    _, xp = _as_c(x)
    fb = _as_c(f_base)[1] if f_base is not None else None
    f1 = _as_c(f_mass)[1] if f_mass is not None else None
    f2 = _as_c(f_mass_2)[1] if f_mass_2 is not None else None
    out = np.zeros(6)
    lib.co_double_dynamics(pp, xp, float(u), fb, f1, f2,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def oracle_double_sim_step(params, x, dt, u) -> np.ndarray:
    """Native 1 kHz-substep plant integration for the double cart-pole."""
    lib = _get_lib()
    _, pp = _as_c(_params_vec(params))
    _, xp = _as_c(x)
    out = np.zeros(6)
    lib.co_double_sim_step(pp, xp, float(dt), float(u),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def oracle_closed_loop(
    params, opt_params: OptimizationParams, x0, num_steps: int,
    set_point: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native receding-horizon run. Returns ``(u (steps,), states (steps, 4))``
    with states recorded before each tick (the reference test convention)."""
    lib = _get_lib()
    _, pp = _as_c(_params_vec(params))
    _, op = _as_c(_opt_vec(opt_params))
    _, xp = _as_c(x0)
    u_out = np.zeros(num_steps)
    states_out = np.zeros((num_steps, 4))
    rc = lib.co_single_closed_loop(
        pp, op, float(set_point), xp, int(num_steps),
        u_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        states_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"native closed loop failed with code {rc}")
    return u_out, states_out
