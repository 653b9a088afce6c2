"""Sharding context and constraint helpers.

The model code is written once and stays mesh-agnostic: layers call
``constrain(x, "data", "model", None)`` at the tensors that define the
parallel layout (window batches over the data axis; GAT node/edge partitions
and temporal sequence blocks over the model axis). When no mesh is active the
calls are no-ops; when a mesh is active they become
``with_sharding_constraint`` anchors from which GSPMD propagates shardings
and inserts the ICI collectives (all-gather of the key-side projections and
node values across the model axis — the "boundary node exchange" of an edge
partition — and gradient psums across data).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_active_mesh: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "mtad_gat_tpu_mesh", default=None
)


def current_mesh() -> Optional[Mesh]:
    return _active_mesh.get()


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    token = _active_mesh.set(mesh)
    try:
        yield mesh
    finally:
        _active_mesh.reset(token)


def constrain(x: jax.Array, *axes: Optional[str]) -> jax.Array:
    """Apply a sharding constraint if a mesh is active; axis names not present
    in the active mesh degrade to None (replicated on that dim)."""
    mesh = current_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    spec = PartitionSpec(*[a if (a in names) else None for a in axes])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
