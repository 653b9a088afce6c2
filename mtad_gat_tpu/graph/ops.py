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
#
# Two implementations of the same math:
#
# - **unrolled** (``gatv2_banded_attention`` / ``gatv1_banded_attention``):
#   a Python loop of 2W+1 static rolls. Fastest at small W (everything fuses
#   into one kernel), but HLO size is O(W) — compile time grows ~4x from
#   W=10 to W=128 (measured).
# - **scan** (``banded_attention_scan``): ``lax.scan`` over *block*-diagonal
#   offsets with flash-attention-style online softmax. Program size is O(1)
#   in W; per-step work is a (B,B) dense attention block pair, so the
#   aggregation rides the MXU. This is the long-window path (band:256 at
#   lookback 8192 compiles in seconds).
#
# The layer dispatches on W (``BAND_UNROLL_CUTOFF``); both are parity-pinned
# against the masked-dense oracle and each other (tests/test_model_graphs.py).

# Above this bandwidth the unrolled banded path's O(W) program size starts to
# dominate compile time; the scan path takes over (nn/gat.py dispatch).
BAND_UNROLL_CUTOFF = 32


def _banded_bias_cols(
    bias: jax.Array, n: int, bandwidth: int, bias_storage: str
) -> jax.Array:
    """(N, 2W+1) diagonal-layout view of the score bias.

    ``bias_storage="full"``: gather the band out of the reference-style (N, N)
    matrix. ``"band"``: the parameter already lives in diagonal layout
    (column w = offset j-i+W) — the O(N·W) storage the long-window config
    uses instead of an O(N²) parameter."""
    if bias_storage == "band":
        return bias
    i = jnp.arange(n)[:, None]
    j = i + jnp.arange(-bandwidth, bandwidth + 1)[None, :]
    return bias[i, jnp.clip(j, 0, n - 1)]


def banded_bias_to_full(bias_band: jax.Array, n: int, bandwidth: int) -> jax.Array:
    """Expand (N, 2W+1) banded bias storage to the dense (N, N) matrix
    (off-band entries zero). Used by the COO oracle path and checkpoints
    that need the dense view; O(N²) — small-N/test use only."""
    i = jnp.arange(n)[:, None]
    o = jnp.arange(-bandwidth, bandwidth + 1)[None, :]
    j = i + o
    valid = (j >= 0) & (j < n)
    full = jnp.zeros((n, n), bias_band.dtype)
    return full.at[i, jnp.clip(j, 0, n - 1)].add(
        jnp.where(valid, bias_band, 0.0)
    )


def _banded_finish(
    scores: jax.Array,          # (b, N, 2W+1) raw diagonal-layout scores
    bias: Optional[jax.Array],
    v: jax.Array,               # (b, N, d)
    bandwidth: int,
    bias_storage: str,
    dropout_rate: float,
    dropout_rng: Optional[jax.Array],
) -> jax.Array:
    """Shared tail of the unrolled banded paths: mask wraps, add bias,
    softmax over the band, dropout, diagonal-layout aggregation, sigmoid."""
    n = v.shape[1]
    i = jnp.arange(n)[:, None]
    o = jnp.arange(-bandwidth, bandwidth + 1)[None, :]
    valid = ((i + o) >= 0) & ((i + o) < n)                 # (N, 2W+1)
    if bias is not None:
        scores = scores + _banded_bias_cols(bias, n, bandwidth, bias_storage)[None]
    scores = jnp.where(valid[None], scores, -jnp.inf)

    att = jax.nn.softmax(scores, axis=-1)                  # (b, N, 2W+1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, att.shape)
        att = jnp.where(keep, att / (1.0 - dropout_rate), 0.0)

    out = jnp.zeros(v.shape, jnp.float32)
    for idx, off in enumerate(range(-bandwidth, bandwidth + 1)):
        vo = jnp.roll(v, -off, axis=1).astype(jnp.float32)
        # invalid offsets carry att == 0 (softmax of -inf), killing wraps
        out = out + att[:, :, idx : idx + 1] * vo
    return jax.nn.sigmoid(out).astype(v.dtype)


def gatv2_banded_attention(
    p: jax.Array,       # (b, N, e) query-side projection
    q: jax.Array,       # (b, N, e) key-side projection (+ lin bias)
    a: jax.Array,       # (e,)
    bias: Optional[jax.Array],  # (N, N) or (N, 2W+1) score bias, or None
    v: jax.Array,       # (b, N, d)
    alpha: float,
    bandwidth: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    bias_storage: str = "full",
) -> jax.Array:
    """Banded GATv2 attention: node i attends to j with |i-j| <= bandwidth.
    Scores/softmax/aggregation all in the (b, N, 2W+1) diagonal layout.
    Unrolled over offsets — small-W path (see ``banded_attention_scan``)."""
    cols = []
    for o in range(-bandwidth, bandwidth + 1):
        # q_o[i] = q[i + o] (roll wraps; wrapped entries are masked below)
        qo = jnp.roll(q, -o, axis=1)
        z = jax.nn.leaky_relu(p + qo, negative_slope=alpha)
        cols.append(
            jnp.einsum("bne,e->bn", z, a, preferred_element_type=jnp.float32)
        )
    scores = jnp.stack(cols, axis=-1)                      # (b, N, 2W+1)
    return _banded_finish(
        scores, bias, v, bandwidth, bias_storage, dropout_rate, dropout_rng
    )


def gatv1_banded_attention(
    u: jax.Array,       # (b, N) query-side rank-1 score half (Wx . a_left)
    w: jax.Array,       # (b, N) key-side rank-1 score half (Wx . a_right)
    bias: Optional[jax.Array],
    v: jax.Array,       # (b, N, d)
    alpha: float,
    bandwidth: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    bias_storage: str = "full",
) -> jax.Array:
    """Banded GATv1 attention. GATv1 scores are rank-1
    (e_ij = leakyrelu(u_i + w_j), reference ``modules.py:80-83``), so the
    diagonal layout is a direct roll of the key half — even cheaper than the
    GATv2 version (no per-offset einsum)."""
    u = u.astype(jnp.float32)
    w = w.astype(jnp.float32)
    cols = [
        jax.nn.leaky_relu(u + jnp.roll(w, -o, axis=1), negative_slope=alpha)
        for o in range(-bandwidth, bandwidth + 1)
    ]
    scores = jnp.stack(cols, axis=-1)                      # (b, N, 2W+1)
    return _banded_finish(
        scores, bias, v, bandwidth, bias_storage, dropout_rate, dropout_rng
    )


def banded_attention_scan(
    p: jax.Array,       # GATv2: (b, N, e) query proj; GATv1: (b, N) u half
    q: jax.Array,       # GATv2: (b, N, e) key proj;   GATv1: (b, N) w half
    a: Optional[jax.Array],  # GATv2: (e,) attention vector; GATv1: None
    bias: Optional[jax.Array],  # (N, N) or (N, 2W+1), per bias_storage
    v: jax.Array,       # (b, N, d)
    alpha: float,
    bandwidth: int,
    block_size: int = 0,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    bias_storage: str = "full",
    key_valid: Optional[jax.Array] = None,   # (N,) bool: attendable keys
) -> jax.Array:
    """W-scalable banded attention: ``lax.scan`` over block-diagonal offsets
    with flash-attention-style online softmax (running max / denominator /
    weighted accumulator, Milakov & Gimelshein 2018).

    The sequence is split into M blocks of B nodes; scan step d computes the
    dense (B, B) attention between each block m and block m+d — a batched
    matmul that rides the MXU — and folds it into the running softmax.
    Program size is O(1) in W (one traced step), work is O(N·(W+B)·e), and
    no O(N²) tensor ever exists. This is the long-window path the unrolled
    variant (O(W) HLO ops) cannot serve; math is identical (parity-pinned).

    Dropout draws a fresh fold of ``dropout_rng`` per scan step, so masks
    differ from the unrolled path's single draw — same rate, different
    stream (both are valid reference semantics: dropout on attention
    weights, ``modules.py:90``).

    ``key_valid`` marks keys that may be attended at all (rows stay
    addressable as queries) — the hook the sequence-parallel halo path uses
    to invalidate out-of-sequence halo regions (parallel/banded_halo.py).
    It travels in block layout and per-step block rolls, so it adds no
    gathers.
    """
    gatv2 = a is not None
    b, n = v.shape[0], v.shape[1]
    dv = v.shape[2]
    if block_size <= 0:
        # Measured on v5e (end-to-end long-window training): B=128 is best
        # for W<=128 (1397/254 windows/s at lookback 1024/4096), B=64 for
        # wide bands (W=256 attention fwd+bwd 21.5 ms vs 39.3 at B=128;
        # lookback-8192 training 84 vs 72 windows/s) — smaller blocks waste
        # less of the block-diagonal cover and keep the per-step
        # (b, M, B, B, e) score intermediate VMEM-friendly.
        block_size = 64 if bandwidth >= 192 else 128
    B = min(block_size, -(-n // 8) * 8)    # never larger than padded N
    M = -(-n // B)
    Np = M * B
    pad = Np - n

    def padn(x):
        if pad == 0:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[1] = (0, pad)
        return jnp.pad(x, cfg)

    if gatv2:
        pB = padn(p).reshape(b, M, B, -1)
        qB = padn(q).reshape(b, M, B, -1)
    else:
        pB = padn(p.astype(jnp.float32)).reshape(b, M, B)
        qB = padn(q.astype(jnp.float32)).reshape(b, M, B)
    vB = padn(v).astype(jnp.float32).reshape(b, M, B, dv)
    kvB = None
    if key_valid is not None:
        kv = jnp.pad(key_valid, (0, pad)) if pad else key_valid
        kvB = kv.reshape(M, B)

    # block-offset range covering the band (clamped: |i-j| < N always)
    D = min(-(-bandwidth // B), M)
    steps = 2 * D + 1
    offs = jnp.arange(-D, D + 1)

    # Banded bias in block-extractable form. The per-step block of the bias
    # is bb[m, i, j] = band[m*B+i, d*B + j - i + W]: the column shift depends
    # only on i (periodic in the block), so instead of a gather — measured
    # at ~70% of the whole forward pass at N=4096/W=128 — the block is cut
    # out with ONE dynamic column slice plus a flatten/reshape shear (row i
    # of a (B, C) window starts at flat offset i*(C-1) + B-1, so slicing the
    # flat array at stride C-1 IS the diagonal extraction). Zero gathers.
    bias_blocks = None
    if bias is not None and bias_storage == "band":
        _PL = 2 * B                               # covers c0 under/overflow
        bias_blocks = jnp.pad(
            bias.astype(jnp.float32), ((0, pad), (0, 0))
        ).reshape(M, B, 2 * bandwidth + 1)
        bias_blocks = jnp.pad(bias_blocks, ((0, 0), (0, 0), (_PL, _PL)))
    _C = 2 * B - 1                                # shear window width

    mi = jnp.arange(M) * B                          # block start rows
    li = jnp.arange(B)
    gi = mi[:, None] + li[None, :]                  # (M, B) global i
    gi_c = jnp.clip(gi, 0, n - 1)
    # local offset within a block pair is constant across m
    loff = li[None, :] - li[:, None]                # (B, B) = lj - li

    has_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if has_dropout:
        xs = (offs, jax.random.split(dropout_rng, steps))
    else:
        xs = (offs,)

    neg_inf = jnp.float32(-jnp.inf)

    def step(carry, x):
        m_run, denom, acc = carry
        if has_dropout:
            d, rng_d = x
        else:
            (d,) = x
        qd = jnp.roll(qB, -d, axis=1)
        vd = jnp.roll(vB, -d, axis=1)
        gj = gi + d * B                              # (M, B) global j
        off = d * B + loff                           # (B, B) global j - i
        valid = (
            (jnp.abs(off)[None] <= bandwidth)
            & (gj[:, None, :] >= 0) & (gj[:, None, :] < n)
            & (gi[:, :, None] < n)
        )                                            # (M, B, B)
        if kvB is not None:
            valid = valid & jnp.roll(kvB, -d, axis=0)[:, None, :]

        if gatv2:
            z = jax.nn.leaky_relu(
                pB[:, :, :, None, :] + qd[:, :, None, :, :],
                negative_slope=alpha,
            )
            s = jnp.einsum(
                "bmije,e->bmij", z, a, preferred_element_type=jnp.float32
            )
        else:
            s = jax.nn.leaky_relu(
                pB[:, :, :, None] + qd[:, :, None, :], negative_slope=alpha
            )

        if bias is not None:
            if bias_storage == "band":
                # shear extraction (see bias_blocks above): one dynamic
                # column slice + static flatten/stride reshape, no gathers
                c0 = d * B + bandwidth - (B - 1) + 2 * B
                colwin = jax.lax.dynamic_slice_in_dim(
                    bias_blocks, c0, _C, axis=2
                )                                        # (M, B, C)
                flat = colwin.reshape(M, B * _C)
                bb = jax.lax.slice_in_dim(
                    flat, B - 1, B - 1 + B * (_C - 1), axis=1
                ).reshape(M, B, _C - 1)[:, :, :B]
            else:
                gj_c = jnp.clip(gj, 0, n - 1)
                bb = bias[gi_c[:, :, None], gj_c[:, None, :]]
            s = s + bb[None]

        # online softmax update; fully-masked rows stay at m = -inf, denom 0
        blk_max = jnp.max(jnp.where(valid[None], s, neg_inf), axis=-1)
        m_new = jnp.maximum(m_run, blk_max)
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        scale = jnp.where(jnp.isfinite(m_run), jnp.exp(m_run - safe_m), 0.0)
        wgt = jnp.where(valid[None], jnp.exp(s - safe_m[..., None]), 0.0)
        denom = denom * scale + wgt.sum(axis=-1)
        wk = wgt
        if has_dropout:
            keep = jax.random.bernoulli(rng_d, 1.0 - dropout_rate, wgt.shape)
            # reference semantics: dropout on normalized weights — numerator
            # only; the denominator keeps every (non-masked) edge
            wk = jnp.where(keep, wgt / (1.0 - dropout_rate), 0.0)
        acc = acc * scale[..., None] + jnp.einsum(
            "bmij,bmjd->bmid", wk, vd, preferred_element_type=jnp.float32
        )
        return (m_new, denom, acc), None

    carry0 = (
        jnp.full((b, M, B), neg_inf),
        jnp.zeros((b, M, B), jnp.float32),
        jnp.zeros((b, M, B, dv), jnp.float32),
    )
    # Rematerialize each step: without this, autodiff saves the per-step
    # (b, M, B, B, e) score intermediates across all scan steps — ~10 GB at
    # lookback 8192 / band 256 (measured OOM). Recomputing scores in the
    # backward pass is the standard flash-attention trade: ~1.3x forward
    # FLOPs for O(N) instead of O(N·W·e) residual memory. Dropout masks are
    # reproduced exactly on recompute (the per-step rng key is scan input).
    (_, denom, acc), _ = jax.lax.scan(jax.checkpoint(step), carry0, xs)
    out = acc / jnp.where(denom > 0, denom, 1.0)[..., None]
    out = out.reshape(b, Np, dv)[:, :n]
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
