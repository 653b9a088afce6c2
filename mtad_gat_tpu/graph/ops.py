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
# Banded-dense path (TPU-native banded topology)
# ---------------------------------------------------------------------------
#
# COO gathers cost ~40x per edge vs the dense fused broadcast on TPU
# (measured, docs/PERFORMANCE.md), so a banded graph computed via COO only
# breaks even at huge N. The banded-dense layout instead stores scores as
# (b, N, 2W+1) — one column per diagonal offset — built from jnp.roll of the
# key-side projection: fully regular memory access, no gathers, O(N·W) work.
# Exactly equal to masked-dense (and thus to the COO path) on the banded
# edge set; the model's temporal band:W spec routes here under the default
# attention_impl="dense".


def gatv2_banded_attention(
    p: jax.Array,       # (b, N, e) query-side projection
    q: jax.Array,       # (b, N, e) key-side projection (+ lin bias)
    a: jax.Array,       # (e,)
    bias: Optional[jax.Array],  # (N, N) learnable score bias, or None
    v: jax.Array,       # (b, N, d)
    alpha: float,
    bandwidth: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Banded GATv2 attention: node i attends to j with |i-j| <= bandwidth.
    Scores/softmax/aggregation all in the (b, N, 2W+1) diagonal layout."""
    n = p.shape[1]
    offsets = range(-bandwidth, bandwidth + 1)

    cols = []
    for o in offsets:
        # q_o[i] = q[i + o] (roll wraps; wrapped entries are masked below)
        qo = jnp.roll(q, -o, axis=1)
        z = jax.nn.leaky_relu(p + qo, negative_slope=alpha)
        cols.append(
            jnp.einsum("bne,e->bn", z, a, preferred_element_type=jnp.float32)
        )
    scores = jnp.stack(cols, axis=-1)                      # (b, N, 2W+1)

    i = jnp.arange(n)[:, None]
    o = jnp.arange(-bandwidth, bandwidth + 1)[None, :]
    j = i + o
    valid = (j >= 0) & (j < n)                             # (N, 2W+1)
    if bias is not None:
        # only the band of the (N, N) bias is read — (N, 2W+1) values
        band_bias = bias[i, jnp.clip(j, 0, n - 1)]
        scores = scores + band_bias[None]
    scores = jnp.where(valid[None], scores, -jnp.inf)

    att = jax.nn.softmax(scores, axis=-1)                  # (b, N, 2W+1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, att.shape)
        att = jnp.where(keep, att / (1.0 - dropout_rate), 0.0)

    out = jnp.zeros(v.shape, jnp.float32)
    for idx, off in enumerate(offsets):
        vo = jnp.roll(v, -off, axis=1).astype(jnp.float32)
        # invalid offsets carry att == 0 (softmax of -inf), killing wraps
        out = out + att[:, :, idx : idx + 1] * vo
    return jax.nn.sigmoid(out).astype(v.dtype)


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
