"""Segment ops: the sparse-graph reduction primitives.

These are the TPU-native building blocks for neighborhood aggregation:
``segment_softmax`` normalizes edge scores within each destination segment
(the sparse analogue of the reference's ``torch.softmax(e, dim=2)``,
``modules.py:89``), ``segment_sum`` is the SpMM reduction.

All ops take static ``num_segments`` so shapes stay known to XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )


def segment_softmax(
    scores: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Numerically stable softmax within each segment.

    scores: (E,) edge scores; returns (E,) normalized weights that sum to 1
    within each destination segment.
    """
    seg_max = segment_max(scores, segment_ids, num_segments)
    # Empty segments produce -inf max; they contribute no edges, so the gather
    # below never reads them in a way that matters.
    shifted = scores - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    seg_sum = segment_sum(ex, segment_ids, num_segments)
    return ex / seg_sum[segment_ids]
