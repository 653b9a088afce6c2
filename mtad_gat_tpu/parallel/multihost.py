"""Multi-host runtime (SURVEY.md §2.7: a new first-class component — the
reference is single-process single-device).

On a TPU pod slice, each host process calls :func:`initialize` once before
any jax computation; the global mesh then spans all hosts' devices, with DCN
crossing handled by GSPMD exactly like ICI (collectives are inserted from the
same ``constrain`` anchors). Data loading is per-host: each process feeds the
window start-indices for its shard of the data axis via
:func:`host_local_starts`.

Single-host fallback is automatic, so all call sites are portable down to the
8-device CPU test farm.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import jax
import numpy as np

def _pod_evidence() -> list:
    """Environment markers of a managed MULTI-process bootstrap (TPU pod
    slice / cluster launcher). A failed auto-initialize with these present is
    a real misconfiguration — silently degrading to single-host training
    would waste the whole slice. Single-host TPU environments also set
    ``TPU_WORKER_HOSTNAMES`` (to one hostname), so host lists only count as
    pod evidence when they actually name multiple workers."""
    ev = []
    for var in ("TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES"):
        if "," in os.environ.get(var, ""):
            ev.append(var)
    for var in (
        "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
    ):
        if os.environ.get(var):
            ev.append(var)
    return ev


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper; no-op for single-process runs
    (auto-detected when no coordinator is given and no pod/cluster env is
    set). A failed auto-bootstrap in a pod environment fails loudly."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            pod_vars = _pod_evidence()
            if pod_vars:
                print(
                    "multihost.initialize: auto-bootstrap FAILED with pod env "
                    f"vars {pod_vars} set ({e!r}); refusing to degrade to "
                    "single-host training.",
                    file=sys.stderr,
                )
                raise
            # plain single-host: nothing to initialize
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the single process that owns filesystem writes (checkpoints,
    metrics, summaries, pickles). On a pod every process runs the same
    program; without this gate they would all write the same paths
    concurrently. Single-process runs are always primary."""
    return jax.process_index() == 0


def host_local_starts(
    all_starts: np.ndarray, data_shards: int
) -> np.ndarray:
    """Slice a (n_batches, bs) epoch start-index array down to this host's
    rows of the data axis. ``bs`` must be divisible by ``data_shards``; the
    host keeps the contiguous column block matching its position so the
    global array assembled across hosts equals the single-host layout."""
    pid, pcount = process_info()
    if pcount == 1:
        return all_starts
    bs = all_starts.shape[1]
    assert bs % pcount == 0, f"batch {bs} not divisible by {pcount} hosts"
    per = bs // pcount
    return all_starts[:, pid * per : (pid + 1) * per]


def epoch_arrays(mesh, starts, mask):
    """Assemble the (n_batches, bs) epoch start/mask arrays for the jitted
    epoch scan. Single-process: pass-through (jit shards them from the
    ``constrain`` anchors). Multi-process: every host computes the SAME
    seeded shuffle, keeps only its column block (``host_local_starts``), and
    contributes it to a globally-sharded ``jax.Array`` whose batch dimension
    is split over the mesh's data axis — the standard per-host data-feeding
    pattern for pod slices."""
    _, pcount = process_info()
    if pcount == 1 or mesh is None:
        return starts, mask
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
    return (
        jax.make_array_from_process_local_data(
            sharding, np.asarray(host_local_starts(starts, pcount))
        ),
        jax.make_array_from_process_local_data(
            sharding, np.asarray(host_local_starts(mask, pcount))
        ),
    )
