"""Profiling helpers (SURVEY.md §5: the reference has only wall-clock prints;
this adds proper device traces).

``trace(log_dir)`` wraps ``jax.profiler.trace`` — view the result with
TensorBoard's profile plugin or xprof. ``timed`` is a lightweight wall-clock
section timer that also forces device completion via a host fetch (plain
``block_until_ready`` is not a reliable barrier over remote-attached TPUs).

Device tracing verified working on the remote-attach (axon PJRT) backend of
this project's bench machine: ``stop_trace`` returns and the captured
``*.xplane.pb`` / ``*.trace.json.gz`` contain a real ``/device:TPU:0`` plane
(pinned by ``tests_tpu/test_hardware_kernels.py::
test_profile_dir_device_trace_on_hardware``; an earlier toolchain could hang
in ``stop_trace`` — if that recurs, kill the exact PID and fall back to the
wall-clock knockout methodology in docs/PERFORMANCE.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree) -> None:
    """Fetch one scalar per leaf to guarantee device work is finished."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards") or hasattr(leaf, "device_buffer"):
            np.asarray(jax.device_get(jax.tree.map(lambda x: x, leaf)))
            break


@contextlib.contextmanager
def timed(label: str, result_holder: Optional[dict] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[label] = dt
    print(f"[timed] {label}: {dt*1e3:.2f} ms")
