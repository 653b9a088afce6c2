"""Sliding windows as pure, jit-friendly gathers.

Replaces the reference's ``SlidingWindowDataset`` + torch ``DataLoader``
(``utils.py:107-150``): instead of materializing windows on the host and
shipping one batch per step across the host->device boundary
(``training.py:107-108``), the full series lives in HBM once and every batch
is an on-device gather by start index — windows are (start + arange(window))
row gathers, fully batchable and shardable.

Window semantics match the reference exactly: for a series of length T,
window i is ``data[i : i+window]`` with target ``data[i+window : i+window+h]``
(horizon 1) and there are ``T - window`` windows (``utils.py:114-120``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def num_windows(series_len: int, window: int, horizon: int = 1) -> int:
    """Reference ``SlidingWindowDataset.__len__`` (utils.py:119-120):
    ``T - window`` at the default horizon 1. For horizon > 1 the count is
    clamped so the last window's target stays inside the series — the
    reference ignores horizon here and its final targets silently truncate
    (utils.py:117); on-device gathers would instead read out of bounds
    (``jnp.take`` fills NaN) and poison the loss, so the clamp is load-
    bearing, not cosmetic."""
    return series_len - window - (horizon - 1)


def gather_windows(series: jax.Array, starts: jax.Array, window: int) -> jax.Array:
    """(T, k) series + (b,) starts -> (b, window, k) window batch."""
    idx = starts[:, None] + jnp.arange(window, dtype=starts.dtype)[None, :]
    return jnp.take(series, idx, axis=0)


def gather_targets(
    series: jax.Array, starts: jax.Array, window: int, horizon: int = 1
) -> jax.Array:
    """Targets ``data[i+window : i+window+horizon]`` -> (b, horizon, k)."""
    idx = (
        starts[:, None]
        + window
        + jnp.arange(horizon, dtype=starts.dtype)[None, :]
    )
    return jnp.take(series, idx, axis=0)


def window_batch(
    series: jax.Array, starts: jax.Array, window: int, horizon: int = 1
) -> Tuple[jax.Array, jax.Array]:
    return (
        gather_windows(series, starts, window),
        gather_targets(series, starts, window, horizon),
    )


def batched_starts(
    n_windows: int, batch_size: int, indices=None
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad an index list to a whole number of batches.

    Returns (starts, mask, n_batches) with starts (n_batches, bs) int32 and
    mask (n_batches, bs) float32 marking real (1.0) vs padded (0.0) windows.
    The mask makes partial final batches exact: the reference's per-batch RMSE
    averages over however many windows the torch loader yielded
    (``training.py:122-124``), so padded slots must not contribute.
    """
    import numpy as np

    if indices is None:
        indices = np.arange(n_windows, dtype=np.int32)
    else:
        indices = np.asarray(indices, dtype=np.int32)
    n = len(indices)
    n_batches = max(1, -(-n // batch_size))
    padded = np.zeros((n_batches * batch_size,), dtype=np.int32)
    padded[:n] = indices
    mask = np.zeros((n_batches * batch_size,), dtype=np.float32)
    mask[:n] = 1.0
    return (
        jnp.asarray(padded.reshape(n_batches, batch_size)),
        jnp.asarray(mask.reshape(n_batches, batch_size)),
        n_batches,
    )
