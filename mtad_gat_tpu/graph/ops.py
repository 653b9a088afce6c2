"""GAT attention primitives: SDDMM scoring, softmax, SpMM aggregation.

Two interchangeable paths with identical math:

- **dense**: XLA einsum over all pairs. The GATv2 score
  ``e_ij = a . leakyrelu(W [v_i || v_j] + b)`` is computed in *decomposed*
  form: split W into left/right halves so ``W [v_i||v_j] = p_i + q_j`` with
  ``p = v @ W_l`` and ``q = v @ W_r + b``. The (b,N,N,e) intermediate is a
  broadcast + elementwise + reduce that XLA fuses into the score loop — the
  reference instead materializes a (b,N,N,2d) concat tensor via
  repeat_interleave (``modules.py:97-122``), the single most memory-hungry op
  in its forward pass.
- **coo**: the same scores over an explicit edge list with segment softmax —
  the general sparse path; reduces to the dense result on complete graphs
  (tested invariant).

Reference semantics preserved exactly: learnable (N,N) bias added to scores
(``modules.py:85-86``), softmax over the key axis (``modules.py:89``), dropout
on the attention weights (``modules.py:90``), sigmoid output nonlinearity
(``modules.py:93``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mtad_gat_tpu.graph.segment import segment_softmax, segment_sum
from mtad_gat_tpu.graph.structure import Graph


def gatv2_scores_dense(
    p: jax.Array,      # (b, N, e) left projection (query side)
    q: jax.Array,      # (b, N, e) right projection + lin bias (key side)
    a: jax.Array,      # (e,)
    alpha: float,
) -> jax.Array:
    """All-pairs GATv2 scores: e_ij = a . leakyrelu(p_i + q_j).  (b, N, N)."""
    z = p[:, :, None, :] + q[:, None, :, :]
    z = jax.nn.leaky_relu(z, negative_slope=alpha)
    # Fused broadcast+elementwise+reduce; the (b,N,N,e) tensor is virtual.
    return jnp.einsum("bije,e->bij", z, a, preferred_element_type=jnp.float32)


def gatv1_scores_dense(
    wx: jax.Array,     # (b, N, e) shared projection
    a_left: jax.Array,  # (e,)
    a_right: jax.Array,  # (e,)
    alpha: float,
) -> jax.Array:
    """GATv1 scores are rank-1: e_ij = leakyrelu(u_i + w_j) with
    u = Wx . a_left, w = Wx . a_right (reference ``modules.py:80-83``)."""
    u = jnp.einsum("bne,e->bn", wx, a_left, preferred_element_type=jnp.float32)
    w = jnp.einsum("bne,e->bn", wx, a_right, preferred_element_type=jnp.float32)
    return jax.nn.leaky_relu(u[:, :, None] + w[:, None, :], negative_slope=alpha)


def gat_aggregate_dense(
    scores: jax.Array,        # (b, N, N)
    values: jax.Array,        # (b, N, d)
    bias: Optional[jax.Array],  # (N, N) or None
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    keep_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """softmax over keys -> (optional dropout) -> weighted sum -> sigmoid.

    Dropout takes either a PRNG key (``dropout_rng``, threefry mask) or a
    precomputed ``keep_mask`` (b, N, N) — the latter is how the Pallas
    kernel's hash-derived mask is replayed on the dense path so both compute
    bit-matching semantics (kernels/gat_pallas.py)."""
    if bias is not None:
        scores = scores + bias
    att = jax.nn.softmax(scores, axis=2)
    if keep_mask is None and dropout_rate > 0.0 and dropout_rng is not None:
        keep_mask = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, att.shape
        )
    if keep_mask is not None and dropout_rate > 0.0:
        att = jnp.where(keep_mask, att / (1.0 - dropout_rate), 0.0)
    h = jnp.einsum(
        "bij,bjd->bid", att, values, preferred_element_type=jnp.float32
    ).astype(values.dtype)
    return jax.nn.sigmoid(h)


# ---------------------------------------------------------------------------
# Sparse (COO) path
# ---------------------------------------------------------------------------

def gatv2_scores_coo(
    graph: Graph,
    p: jax.Array,      # (b, N, e)
    q: jax.Array,      # (b, N, e)
    a: jax.Array,      # (e,)
    alpha: float,
) -> jax.Array:
    """SDDMM: per-edge GATv2 scores. Returns (b, E)."""
    z = p[:, graph.dst, :] + q[:, graph.src, :]          # (b, E, e)
    z = jax.nn.leaky_relu(z, negative_slope=alpha)
    return jnp.einsum("bef,f->be", z, a, preferred_element_type=jnp.float32)


def gatv1_scores_coo(
    graph: Graph,
    wx: jax.Array,      # (b, N, e) shared projection
    a_left: jax.Array,  # (e,)
    a_right: jax.Array,  # (e,)
    alpha: float,
) -> jax.Array:
    """GATv1 per-edge scores (sparse form of ``gatv1_scores_dense``):
    e_ij = leakyrelu(u_i + w_j) with u = Wx . a_left, w = Wx . a_right.
    Returns (b, E)."""
    u = jnp.einsum("bne,e->bn", wx, a_left, preferred_element_type=jnp.float32)
    w = jnp.einsum("bne,e->bn", wx, a_right, preferred_element_type=jnp.float32)
    return jax.nn.leaky_relu(
        u[:, graph.dst] + w[:, graph.src], negative_slope=alpha
    )


def gat_aggregate_coo(
    graph: Graph,
    scores: jax.Array,        # (b, E)
    values: jax.Array,        # (b, N, d)
    bias: Optional[jax.Array],  # (N, N) or None — gathered per edge
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Segment softmax over destination segments + SpMM. Returns (b, N, d)."""
    if bias is not None:
        scores = scores + bias[graph.dst, graph.src][None, :]

    def one(s: jax.Array, v: jax.Array, rng) -> jax.Array:
        att = segment_softmax(s, graph.dst, graph.n_nodes)      # (E,)
        if dropout_rate > 0.0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, att.shape)
            att = jnp.where(keep, att / (1.0 - dropout_rate), 0.0)
        msgs = att[:, None] * v[graph.src, :]                   # (E, d)
        return segment_sum(msgs, graph.dst, graph.n_nodes)      # (N, d)

    if dropout_rate > 0.0 and dropout_rng is not None:
        rngs = jax.random.split(dropout_rng, scores.shape[0])
        h = jax.vmap(one)(scores, values, rngs)
    else:
        h = jax.vmap(lambda s, v: one(s, v, None))(scores, values)
    return jax.nn.sigmoid(h.astype(values.dtype))
