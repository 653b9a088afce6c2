"""Device mesh construction.

The reference has no distributed support at all (SURVEY.md §2.7); this is the
TPU-native communication/parallelism substrate: a named ``jax.sharding.Mesh``
with a ``data`` axis (window/batch parallelism) and a ``model`` axis (graph
node / edge partition for the feature GAT, sequence blocks for the temporal
GAT). Collectives ride ICI via GSPMD-inserted all-gathers/psums — there is no
hand-written NCCL analogue to port.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def best_mesh_shape(n_devices: int, model_parallel: Optional[int] = None) -> Tuple[int, int]:
    """(data, model) factorization: prefer a balanced split with the model
    axis a power of two (attention node counts tile best that way)."""
    if model_parallel is not None:
        assert n_devices % model_parallel == 0
        return n_devices // model_parallel, model_parallel
    if n_devices == 1:
        return 1, 1
    mp = 1
    while mp * 2 <= n_devices and (n_devices // (mp * 2)) * (mp * 2) == n_devices and mp < 4:
        mp *= 2
    return n_devices // mp, mp


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    dp, mp = best_mesh_shape(n, model_parallel)
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
