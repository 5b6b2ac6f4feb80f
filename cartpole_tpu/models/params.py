"""Dynamics parameter PyTrees for the cart-pole model families.

Capability parity with the reference C++ structs (see
``/root/reference/optimization/structs.hpp:8-41`` for ``SingleCartPoleParams`` and
``/root/reference/symbolic/dynamics_double.py:14-22`` for the double-pole params),
re-designed as frozen PyTree dataclasses so they vmap/shard/jit transparently:
a batch of systems is simply a ``SingleCartPoleParams`` whose leaves carry a
leading batch axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "SingleCartPoleParams",
    "DoubleCartPoleParams",
    "TripleCartPoleParams",
    "default_single_params",
    "default_double_params",
    "default_triple_params",
]


def _pytree_dataclass(cls):
    """Register a frozen dataclass where every field is a PyTree data leaf,
    with a JSON round trip over the same field names the reference
    serializes (``wasm.cc:19-28``)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])

    def to_json(self) -> str:
        import json

        return json.dumps(
            {k: float(v) for k, v in self.as_dict().items()}, sort_keys=True
        )

    @classmethod
    def from_json(klass, payload: str):
        import json

        data = json.loads(payload)
        known = {f.name for f in dataclasses.fields(klass)}
        unknown = sorted(set(data) - known)
        if unknown:
            raise ValueError(
                f"unknown {klass.__name__} field(s) {unknown}; "
                f"known fields: {sorted(known)}"
            )
        return klass(**data)

    cls.to_json = to_json
    cls.from_json = from_json
    return cls


@_pytree_dataclass
class SingleCartPoleParams:
    """Physical parameters of the cart + single pole system.

    Mirrors the 9-parameter surface of the reference
    (``structs.hpp:8-41``): every field may be a python float or a JAX array
    (scalar or batched).
    """

    m_b: Any = 1.0  #: Mass of the base / cart (kg).
    m_1: Any = 0.1  #: Point mass at the pole tip (kg).
    l_1: Any = 0.25  #: Pole length (m).
    g: Any = 9.81  #: Gravitational acceleration (m/s^2).
    mu_b: Any = 0.03  #: Coulomb friction coefficient at the base.
    v_mu_b: Any = 0.1  #: Cutoff velocity of the smoothed Coulomb model (m/s).
    c_d_1: Any = 0.13  #: Air-drag coefficient on the pole mass (rho*C_d*A).
    x_s: Any = 0.8  #: Position of the boundary bumper springs (m).
    k_s: Any = 100.0  #: Bumper spring constant (N/m).

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}


@_pytree_dataclass
class DoubleCartPoleParams:
    """Physical parameters of the cart + two-link pole system.

    Mirrors ``symbolic/dynamics_double.py:14-22`` (6 parameters; the reference
    double-pole model carries no friction/drag/springs).
    """

    m_b: Any = 1.0  #: Mass of the base / cart (kg).
    m_1: Any = 0.1  #: Point mass at the first link tip (kg).
    m_2: Any = 0.1  #: Point mass at the second link tip (kg).
    l_1: Any = 0.25  #: First link length (m).
    l_2: Any = 0.25  #: Second link length (m).
    g: Any = 9.81  #: Gravitational acceleration (m/s^2).

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}


@_pytree_dataclass
class TripleCartPoleParams:
    """Physical parameters of the cart + three-link pole chain.

    One link beyond the reference's WIP double model
    (``symbolic/dynamics_double.py:14-22``); same conservative structure.
    """

    m_b: Any = 1.0  #: Mass of the base / cart (kg).
    m_1: Any = 0.1  #: Point mass at the first link tip (kg).
    m_2: Any = 0.1  #: Point mass at the second link tip (kg).
    m_3: Any = 0.1  #: Point mass at the third link tip (kg).
    l_1: Any = 0.25  #: First link length (m).
    l_2: Any = 0.25  #: Second link length (m).
    l_3: Any = 0.25  #: Third link length (m).
    g: Any = 9.81  #: Gravitational acceleration (m/s^2).

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}


def default_single_params(dtype=jnp.float32) -> SingleCartPoleParams:
    """The nominal system used by the reference closed-loop test
    (``optimization_test.cc:22``)."""
    p = SingleCartPoleParams()
    return jax.tree.map(lambda v: jnp.asarray(v, dtype=dtype), p)


def default_double_params(dtype=jnp.float32) -> DoubleCartPoleParams:
    p = DoubleCartPoleParams()
    return jax.tree.map(lambda v: jnp.asarray(v, dtype=dtype), p)


def default_triple_params(dtype=jnp.float32) -> TripleCartPoleParams:
    p = TripleCartPoleParams()
    return jax.tree.map(lambda v: jnp.asarray(v, dtype=dtype), p)
