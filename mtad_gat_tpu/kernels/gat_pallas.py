"""Fused blockwise GATv2 attention — the Pallas TPU hot-path kernel.

Computes, for each destination node i over a complete graph:

    out_i = sigmoid( sum_j softmax_j( a . leakyrelu(p_i + q_j) + bias_ij ) v_j )

in flash-attention style: the (N, N) score matrix is never materialized in
HBM. The grid is (batch, i-blocks, j-blocks, e-chunks) with the j dimension
as the online-softmax reduction and the embedding-chunk dimension innermost:
each grid step computes one (BI, BJ, EC) piece of the SDDMM (additive GATv2
scores have no QK^T matmul structure, so this part is VPU work) and
accumulates it into a VMEM score tile; when the last chunk of a tile lands,
the kernel performs the online max/denominator update and accumulates
``exp(s - m) @ v`` on the MXU.

This replaces the reference's (b, N, N, 2d) repeat_interleave concat tensor
(``modules.py:97-122``) — its single most memory-hungry op — with an
O(BI * BJ * EC) VMEM working set, making window/node counts of 4k+
feasible on a single chip.

Mosaic (TPU v5e) lowering constraints that shaped this design, all measured:

- bf16 sublane-broadcasts fail to lower (``vector<40x1x64xbf16>`` shape
  casts are rejected), so the kernel's VMEM-resident elementwise math is
  f32; HBM traffic stays in the input dtype (bf16 halves bandwidth).
- Temporaries of a Python-unrolled loop are stack-allocated WITHOUT reuse
  (a 7-chunk unrolled SDDMM overflows the 16 MB scoped-vmem limit), so the
  forward puts the chunk axis in the Pallas grid — one chunk's temporaries
  live at a time, and chunk DMA overlaps compute for free. The backward
  kernels compute each (BI, BJ, Ep) tile at full embedding width (chunking
  would not reduce peak VMEM without buffer reuse, and lane-offset chunk
  slices hit "Invalid input layout" on broadcasts) and instead shrink the
  row block BI, falling back to dense-recompute math (identical values)
  when the embedding is too wide for any row block.

Attention-weight dropout (reference placement ``modules.py:89-90``: mask the
softmaxed weights, scale by 1/(1-p), do NOT renormalize) runs INSIDE the
kernel: the keep decision is a counter-based integer hash of
(seed, batch, global row, global col) — tiling-independent by construction,
so the backward's different row-blocking regenerates identical masks — and
the online-softmax denominator accumulates unmasked weights while only the
aggregate is masked, which streams exactly. The ``impl="pallas"`` training
path therefore exercises this kernel at flagship defaults (dropout 0.3).

Performance note: additive GATv2 scores are O(N^2 E) VPU work with no matmul
structure, and XLA's fused broadcast+reduce on the decomposed dense path
(``graph/ops.py``) already runs near VPU speed-of-light at the reference's
node counts (N in 38..100), so ``dense`` remains the default production path.
This kernel is the bounded-memory path for very large node counts where the
(b, N, N) score tensor and its softmax re-reads stop fitting: it keeps HBM
traffic at O(N * E + N * D) per row block regardless of N.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtad_gat_tpu.graph.ops import gat_aggregate_dense, gatv2_scores_dense

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Attention-weight dropout inside the kernel.
#
# The keep/drop decision must be a pure function of (seed, batch, global row,
# global col): the forward tiles rows by block_i but the backward re-tiles by
# block_i_bwd (VMEM budgets differ), so any per-tile PRNG stream would
# desynchronize the masks between passes. A counter-based integer hash over
# the global coordinates is tiling-independent by construction and runs as
# plain 32-bit VPU vector ops (xor/shift/multiply) — no PRNG state, no DMA.
# Reference dropout placement (modules.py:89-90): the softmaxed weights are
# masked and scaled by 1/(1-p) WITHOUT renormalizing the denominator.
# ---------------------------------------------------------------------------

_DROP_C1 = 0x9E3779B9   # golden-ratio increments / murmur-style finalizer
_DROP_C2 = 0x85EBCA6B
_DROP_C3 = 0xC2B2AE35
_DROP_CB = 0x27D4EB2F


def _hash_u32(seed, b, rows, cols):
    """Mix (seed, batch, row, col) into well-scrambled uint32s. ``rows`` and
    ``cols`` are uint32 arrays of the tile's GLOBAL coordinates; ``seed`` and
    ``b`` are scalars."""
    x = (
        jnp.uint32(seed)
        ^ (jnp.uint32(b) * jnp.uint32(_DROP_CB))
        ^ (rows * jnp.uint32(_DROP_C1))
        ^ (cols * jnp.uint32(_DROP_C2))
    )
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_DROP_C2)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_DROP_C3)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _keep_threshold(rate: float) -> int:
    """uint32 comparison threshold for P(keep) = 1 - rate, clamped so tiny
    rates cannot round to 2^32 (which overflows uint32 and would drop
    EVERYTHING under wraparound)."""
    return min(int(round((1.0 - rate) * 4294967296.0)), 4294967295)


def _keep_mask(seed, b, row0, col0, bi, bj, rate: float):
    """(bi, bj) boolean keep mask for the tile whose top-left global
    coordinate is (row0, col0). P(keep) = 1 - rate."""
    rows = (
        jax.lax.broadcasted_iota(jnp.uint32, (bi, bj), 0)
        + jnp.uint32(row0)
    )
    cols = (
        jax.lax.broadcasted_iota(jnp.uint32, (bi, bj), 1)
        + jnp.uint32(col0)
    )
    bits = _hash_u32(seed, b, rows, cols)
    return bits < jnp.uint32(_keep_threshold(rate))


def hash_keep_mask(seed, batch: int, n_rows: int, n_cols: int, rate: float):
    """Pure-XLA replica of the in-kernel mask for the whole (B, N, N) grid —
    the oracle for tests and the dense-fallback backward."""
    rows = jnp.broadcast_to(
        jnp.arange(n_rows, dtype=jnp.uint32)[:, None], (n_rows, n_cols)
    )
    cols = jnp.broadcast_to(
        jnp.arange(n_cols, dtype=jnp.uint32)[None, :], (n_rows, n_cols)
    )
    thresh = jnp.uint32(_keep_threshold(rate))

    def one(b):
        return _hash_u32(seed, b, rows, cols) < thresh

    return jax.vmap(one)(jnp.arange(batch, dtype=jnp.uint32))


def _kernel(
    p_ref, q_ref, a_ref, bias_ref, v_ref, seed_ref, o_ref,
    s_scr, m_scr, l_scr, acc_scr,
    *, alpha: float, n_nodes: int, block_i: int, block_j: int,
    has_bias: bool, dropout_rate: float = 0.0,
):
    b_idx = pl.program_id(0)
    i_idx = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    c = pl.program_id(3)
    nc = pl.num_programs(3)

    @pl.when((j == 0) & (c == 0))
    def _init_row():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(c == 0)
    def _init_tile():
        s_scr[...] = jnp.zeros_like(s_scr)

    # One SDDMM chunk: s_ij += sum_e a_e * leakyrelu(p_ie + q_je) over this
    # chunk's embedding lanes. Zero-padded a/p/q tails contribute exactly 0.
    pc = p_ref[0].astype(jnp.float32)            # (BI, EC)
    qc = q_ref[0].astype(jnp.float32)            # (BJ, EC)
    ac = a_ref[...].astype(jnp.float32)[0]       # (EC,)
    z = pc[:, None, :] + qc[None, :, :]          # (BI, BJ, EC)
    z = jnp.where(z >= 0, z, alpha * z)          # leaky_relu
    s_scr[...] += jnp.sum(z * ac[None, None, :], axis=-1)

    @pl.when(c == nc - 1)
    def _softmax_update():
        s = s_scr[...]
        if has_bias:
            s = s + bias_ref[...].astype(jnp.float32)
        # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_j
        s = jnp.where(col < n_nodes, s, NEG_INF)

        m_prev = m_scr[:, 0:1]                   # (BI, 1)
        l_prev = l_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        e_s = jnp.exp(s - m_new)                 # (BI, BJ)
        # denominator accumulates the FULL weights; dropout only masks the
        # aggregate (reference placement, modules.py:89-90)
        l_new = l_prev * corr + jnp.sum(e_s, axis=1, keepdims=True)
        e_agg = e_s
        if dropout_rate > 0.0:
            keep = _keep_mask(
                seed_ref[0, 0], b_idx,
                i_idx * block_i, j * block_j,
                e_s.shape[0], e_s.shape[1], dropout_rate,
            )
            e_agg = jnp.where(keep, e_s * (1.0 / (1.0 - dropout_rate)), 0.0)
        acc_scr[...] = acc_scr[...] * corr + jnp.dot(
            e_agg, v_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when((j == nj - 1) & (c == nc - 1))
    def _finalize():
        out = acc_scr[...] / l_scr[:, 0:1]
        o_ref[0] = jax.nn.sigmoid(out).astype(o_ref.dtype)


def _kernel_res(
    p_ref, q_ref, a_ref, bias_ref, v_ref, seed_ref, o_ref, u_ref, m_ref, l_ref,
    s_scr, m_scr, l_scr, acc_scr,
    *, alpha: float, n_nodes: int, block_i: int, block_j: int,
    has_bias: bool, dropout_rate: float = 0.0,
):
    """Forward with residuals: also writes the pre-sigmoid aggregate u and
    the per-row softmax stats (m, l) used by the blockwise backward."""
    _kernel(
        p_ref, q_ref, a_ref, bias_ref, v_ref, seed_ref, o_ref,
        s_scr, m_scr, l_scr, acc_scr,
        alpha=alpha, n_nodes=n_nodes, block_i=block_i, block_j=block_j,
        has_bias=has_bias, dropout_rate=dropout_rate,
    )

    @pl.when(
        (pl.program_id(2) == pl.num_programs(2) - 1)
        & (pl.program_id(3) == pl.num_programs(3) - 1)
    )
    def _write_residuals():
        u_ref[0] = (acc_scr[...] / l_scr[:, 0:1]).astype(u_ref.dtype)
        m_ref[0] = m_scr[...].astype(m_ref.dtype)
        l_ref[0] = l_scr[...].astype(l_ref.dtype)


class _Plan:
    """Blocking/padding plan shared by the forward and backward launches.

    Forward: one (BI, BJ, EC) f32 temporary set is live per grid step (the
    chunk axis is a grid dimension), so BI is sized against a fixed VMEM
    budget with EC <= 128 lanes. Backward: the chunk loop is unrolled inside
    the kernel and Mosaic keeps every unrolled temporary live at once, so the
    backward row block shrinks with the padded embedding width Ep and the
    launch is declared infeasible (dense-recompute fallback) when even an
    8-row block would overflow scoped VMEM."""

    def __init__(self, B, N, E, D):
        self.B, self.N, self.E, self.D = B, N, E, D
        self.block_j = 128
        self.ec = min(128, _round_up(E, 8))
        self.Ep = _round_up(E, self.ec)
        self.nc = self.Ep // self.ec
        self.Dp = _round_up(D, 128)

        # ~4 (BI, BJ, EC) f32 temporaries live per forward grid step
        fwd_budget = 8 << 20
        bi = fwd_budget // (16 * self.block_j * self.ec)
        self.block_i = max(8, min(128, _round_up(N, 8), (bi // 8) * 8))
        self.Nip = _round_up(N, self.block_i)
        self.Njp = _round_up(N, self.block_j)
        self.ni = self.Nip // self.block_i
        self.nj = self.Njp // self.block_j

        # Backward: no chunking. Mosaic keeps unrolled-loop temporaries live
        # simultaneously, so chunking would not reduce peak VMEM — and chunk
        # lane-slices at 128-lane offsets hit "Invalid input layout" on
        # broadcasts. One full-width (BI, BJ, Ep) computation has the same
        # footprint with zero alignment hazards; BI absorbs the budget.
        bwd_budget = 8 << 20
        cap = (bwd_budget // (24 * self.block_j * self.Ep) // 8) * 8
        # block_i_bwd must DIVIDE block_i (hence Nip) so the backward grid
        # covers every padded row — a floor-divided grid over a non-divisor
        # block silently drops the tail rows' gradients
        self.block_i_bwd = 0
        for d in range(min(self.block_i, max(cap, 0)), 0, -8):
            if self.block_i % d == 0:
                self.block_i_bwd = d
                break
        self.bwd_feasible = self.block_i_bwd >= 8
        self.ni_bwd = self.Nip // self.block_i_bwd if self.bwd_feasible else 0

    def pad3(self, x, n2, n3):
        return jnp.pad(x, ((0, 0), (0, n2 - x.shape[1]), (0, n3 - x.shape[2])))

    def pad_inputs(self, p, q, a, bias, v):
        p_p = self.pad3(p, self.Nip, self.Ep)
        q_p = self.pad3(q, self.Njp, self.Ep)
        v_p = self.pad3(v, self.Njp, self.Dp)
        a_p = jnp.pad(a, (0, self.Ep - self.E)).reshape(1, self.Ep)
        bias_p = (
            jnp.pad(bias, ((0, self.Nip - self.N), (0, self.Njp - self.N)))
            if bias is not None
            else jnp.zeros((1, 1), jnp.float32)
        )
        return p_p, q_p, a_p, bias_p, v_p

    def row_stats(self, x, pad_value: float = 0.0):
        """(B, N) -> padded (B, Nip, 128) broadcast over lanes. pad_value
        matters for the backward's padded rows: m pads to +big (so recomputed
        w = exp(s - m) underflows to 0) and l pads to 1 (no 0/0)."""
        xp = jnp.pad(
            x, ((0, 0), (0, self.Nip - self.N)), constant_values=pad_value
        )
        return jnp.broadcast_to(
            xp[:, :, None], (self.B, self.Nip, 128)
        ).astype(jnp.float32)


def _fused_forward(
    p: jax.Array, q: jax.Array, a: jax.Array, bias: Optional[jax.Array],
    v: jax.Array, alpha: float, interpret: bool, with_residuals: bool = False,
    seed: Optional[jax.Array] = None, dropout_rate: float = 0.0,
):
    B, N, E = p.shape
    D = v.shape[-1]
    plan = _Plan(B, N, E, D)
    has_bias = bias is not None
    p_p, q_p, a_p, bias_p, v_p = plan.pad_inputs(p, q, a, bias, v)
    seed_p = (
        jnp.zeros((1, 1), jnp.uint32)
        if seed is None
        else jnp.asarray(seed, jnp.uint32).reshape(1, 1)
    )

    grid = (B, plan.ni, plan.nj, plan.nc)
    bi, bj, ec, Dp, Nip = plan.block_i, plan.block_j, plan.ec, plan.Dp, plan.Nip
    in_specs = [
        pl.BlockSpec((1, bi, ec), lambda b, i, j, c: (b, i, c)),
        pl.BlockSpec((1, bj, ec), lambda b, i, j, c: (b, j, c)),
        pl.BlockSpec((1, ec), lambda b, i, j, c: (0, c)),
        (
            pl.BlockSpec((bi, bj), lambda b, i, j, c: (i, j))
            if has_bias
            else pl.BlockSpec((1, 1), lambda b, i, j, c: (0, 0))
        ),
        pl.BlockSpec((1, bj, Dp), lambda b, i, j, c: (b, j, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # dropout seed scalar
    ]
    operands = [p_p, q_p, a_p, bias_p, v_p, seed_p]
    scratch = [
        pltpu.VMEM((bi, bj), jnp.float32),    # score tile accumulator
        pltpu.VMEM((bi, 128), jnp.float32),   # running max
        pltpu.VMEM((bi, 128), jnp.float32),   # running denom
        pltpu.VMEM((bi, Dp), jnp.float32),    # output accumulator
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
    )
    kw = dict(alpha=alpha, n_nodes=N, block_i=bi, block_j=bj,
              has_bias=has_bias, dropout_rate=dropout_rate)

    if not with_residuals:
        out = pl.pallas_call(
            functools.partial(_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((B, Nip, Dp), v.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bi, Dp), lambda b, i, j, c: (b, i, 0)),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*operands)
        return out[:, :N, :D]

    out, u, m, l = pl.pallas_call(
        functools.partial(_kernel_res, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((B, Nip, Dp), v.dtype),
            jax.ShapeDtypeStruct((B, Nip, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, Nip, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Nip, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bi, Dp), lambda b, i, j, c: (b, i, 0)),
            pl.BlockSpec((1, bi, Dp), lambda b, i, j, c: (b, i, 0)),
            pl.BlockSpec((1, bi, 128), lambda b, i, j, c: (b, i, 0)),
            pl.BlockSpec((1, bi, 128), lambda b, i, j, c: (b, i, 0)),
        ),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*operands)
    return (
        out[:, :N, :D],
        u[:, :N, :D],
        m[:, :N, 0],
        l[:, :N, 0],
    )


# ---------------------------------------------------------------------------
# Blockwise backward (flash-style): recompute score tiles from the saved
# per-row softmax stats (m, l); never materialize (N, N) anything in HBM.
#
# With w = softmax(s), u = w @ v, out = sigmoid(u), and incoming cotangent g:
#   du   = g * out * (1 - out)
#   Dvec_i = sum_d du_id * u_id
#   ds_ij = w_ij * (du_i . v_j - Dvec_i)
#   dv_j  = sum_i w_ij du_i
#   dbias = sum_b ds
#   dp_ie = sum_j ds_ij * a_e * lr'(z_ije),  dq_je = sum_i ds_ij * a_e * lr'
#   da_e  = sum_ij ds_ij * lr(z_ije)
# ---------------------------------------------------------------------------


def _ds_tile(p, q, a, bias_blk, v, m_col, l_col, du, dvec_col,
             *, alpha, n_nodes, block_j, has_bias, j_idx,
             dropout_rate=0.0, seed=None, b_idx=None, row0=None):
    """Recompute the tile's attention weights and score gradient.

    Returns (w_agg, ds) in f32 where w_agg is the weight actually used in the
    aggregate (dropout-masked and 1/(1-p)-scaled when dropout is active) and,
    with u_i = sum_j w_agg_ij v_j, out = sigmoid(u):

        ds_ij = w_agg_ij * (du_i . v_j) - w_ij * (du_i . u_i)

    (the first term flows through the masked numerator, the second through
    the unmasked softmax denominator)."""
    bi, bj = p.shape[0], q.shape[0]
    pf = p.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    af = a.astype(jnp.float32)[0]
    z = pf[:, None, :] + qf[None, :, :]
    z = jnp.where(z >= 0, z, alpha * z)
    s = jnp.sum(z * af[None, None, :], axis=-1)
    if has_bias:
        s = s + bias_blk.astype(jnp.float32)
    w = jnp.exp(s - m_col) / l_col
    col = jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1) + j_idx * block_j
    w = jnp.where(col < n_nodes, w, 0.0)
    if dropout_rate > 0.0:
        keep = _keep_mask(
            seed, b_idx, row0, j_idx * block_j, bi, bj, dropout_rate
        )
        w_agg = jnp.where(keep, w * (1.0 / (1.0 - dropout_rate)), 0.0)
    else:
        w_agg = w
    t = jnp.dot(du, v.astype(jnp.float32).T, preferred_element_type=jnp.float32)
    ds = w_agg * t - w * dvec_col
    return w_agg, ds


def _bwd_dp_da_kernel(
    p_ref, q_ref, a_ref, bias_ref, v_ref, seed_ref, m_ref, l_ref, du_ref,
    dvec_ref, dp_ref, da_ref, dp_scr, da_scr,
    *, alpha, n_nodes, block_i, block_j, has_bias, dropout_rate=0.0,
):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dp_scr[...] = jnp.zeros_like(dp_scr)
        da_scr[...] = jnp.zeros_like(da_scr)

    p, q, a = p_ref[0], q_ref[0], a_ref[...]
    _, ds = _ds_tile(
        p, q, a, bias_ref[...] if has_bias else None, v_ref[0],
        m_ref[0][:, 0:1], l_ref[0][:, 0:1],
        du_ref[0].astype(jnp.float32), dvec_ref[0][:, 0:1],
        alpha=alpha, n_nodes=n_nodes, block_j=block_j,
        has_bias=has_bias, j_idx=j,
        dropout_rate=dropout_rate, seed=seed_ref[0, 0],
        b_idx=pl.program_id(0), row0=pl.program_id(1) * block_i,
    )

    z = p.astype(jnp.float32)[:, None, :] + \
        q.astype(jnp.float32)[None, :, :]                        # (BI,BJ,Ep)
    lrp = jnp.where(z >= 0, 1.0, alpha)
    lr_z = jnp.where(z >= 0, z, alpha * z)
    # Mosaic cannot lower rank-2 x rank-3 dots, so contract by
    # broadcast-multiply-reduce (ds broadcast over the embedding lanes).
    ds3 = jax.lax.broadcast_in_dim(ds, z.shape, (0, 1))
    dp_scr[...] += (
        jnp.sum(ds3 * lrp, axis=1)
        * a.astype(jnp.float32)[0][None, :]
    )
    da_scr[0:1, :] += jnp.sum(ds3 * lr_z, axis=(0, 1))[None, :]

    @pl.when(j == nj - 1)
    def _finalize():
        dp_ref[0] = dp_scr[...].astype(dp_ref.dtype)
        da_ref[0] = da_scr[...].astype(da_ref.dtype)


def _bwd_dq_dv_kernel(
    p_ref, q_ref, a_ref, bias_ref, v_ref, seed_ref, m_ref, l_ref, du_ref,
    dvec_ref, dq_ref, dv_ref, dq_scr, dv_scr,
    *, alpha, n_nodes, block_i, block_j, has_bias, dropout_rate=0.0,
):
    i = pl.program_id(2)
    ni = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    p, q, a = p_ref[0], q_ref[0], a_ref[...]
    du = du_ref[0].astype(jnp.float32)
    w_agg, ds = _ds_tile(
        p, q, a, bias_ref[...] if has_bias else None, v_ref[0],
        m_ref[0][:, 0:1], l_ref[0][:, 0:1], du, dvec_ref[0][:, 0:1],
        alpha=alpha, n_nodes=n_nodes, block_j=block_j,
        has_bias=has_bias, j_idx=j,
        dropout_rate=dropout_rate, seed=seed_ref[0, 0],
        b_idx=pl.program_id(0), row0=i * block_i,
    )

    # dv flows only through the (masked) aggregate weights
    dv_scr[...] += jnp.dot(w_agg.T, du, preferred_element_type=jnp.float32)

    z = p.astype(jnp.float32)[:, None, :] + \
        q.astype(jnp.float32)[None, :, :]                        # (BI,BJ,Ep)
    lrp = jnp.where(z >= 0, 1.0, alpha)
    ds3 = jax.lax.broadcast_in_dim(ds, z.shape, (0, 1))
    dq_scr[...] += (
        jnp.sum(ds3 * lrp, axis=0)
        * a.astype(jnp.float32)[0][None, :]
    )

    @pl.when(i == ni - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dbias_kernel(
    p_ref, q_ref, a_ref, bias_ref, v_ref, seed_ref, m_ref, l_ref, du_ref,
    dvec_ref, dbias_ref, dbias_scr,
    *, alpha, n_nodes, block_i, block_j, has_bias, dropout_rate=0.0,
):
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        dbias_scr[...] = jnp.zeros_like(dbias_scr)

    _, ds = _ds_tile(
        p_ref[0], q_ref[0], a_ref[...], bias_ref[...], v_ref[0],
        m_ref[0][:, 0:1], l_ref[0][:, 0:1],
        du_ref[0].astype(jnp.float32), dvec_ref[0][:, 0:1],
        alpha=alpha, n_nodes=n_nodes, block_j=block_j,
        has_bias=has_bias, j_idx=j,
        dropout_rate=dropout_rate, seed=seed_ref[0, 0],
        b_idx=b, row0=pl.program_id(0) * block_i,
    )
    dbias_scr[...] += ds

    @pl.when(b == nb - 1)
    def _finalize():
        dbias_ref[...] = dbias_scr[...].astype(dbias_ref.dtype)


def _dense_backward(p, q, a, bias, v, g, alpha, seed=None, dropout_rate=0.0):
    """Exact-math fallback when the blockwise backward cannot fit VMEM
    (very wide embeddings): differentiate the decomposed dense path — with
    the SAME hash-derived dropout mask when dropout is active — which
    computes identical values to the fused forward."""
    has_bias = bias is not None
    keep = (
        hash_keep_mask(seed, p.shape[0], p.shape[1], q.shape[1], dropout_rate)
        if dropout_rate > 0.0
        else None
    )

    def f(p_, q_, a_, b_, v_):
        return _dense_reference(
            p_, q_, a_, b_, v_, alpha, keep=keep, dropout_rate=dropout_rate
        )

    if has_bias:
        _, vjp = jax.vjp(f, p, q, a, bias, v)
        dp, dq, da, dbias, dv = vjp(g)
    else:
        _, vjp = jax.vjp(lambda p_, q_, a_, v_: f(p_, q_, a_, None, v_), p, q, a, v)
        dp, dq, da, dv = vjp(g)
        dbias = None
    return dp, dq, da, dbias, dv


def _fused_backward(p, q, a, bias, v, u, m, l, g, alpha, interpret,
                    seed=None, dropout_rate=0.0):
    B, N, E = p.shape
    D = v.shape[-1]
    plan = _Plan(B, N, E, D)
    if not plan.bwd_feasible and not interpret:
        return _dense_backward(p, q, a, bias, v, g, alpha, seed, dropout_rate)
    has_bias = bias is not None
    if interpret:
        bi, ni = plan.block_i, plan.ni
    else:
        bi, ni = plan.block_i_bwd, plan.ni_bwd
    bj, Ep, Dp, Np = plan.block_j, plan.Ep, plan.Dp, plan.Njp

    out = jax.nn.sigmoid(u)
    du = (g.astype(jnp.float32) * out * (1.0 - out))             # (B,N,D)
    dvec = jnp.sum(du * u, axis=-1)                              # (B,N)

    p_p, q_p, a_p, bias_p, v_p = plan.pad_inputs(p, q, a, bias, v)
    seed_p = (
        jnp.zeros((1, 1), jnp.uint32)
        if seed is None
        else jnp.asarray(seed, jnp.uint32).reshape(1, 1)
    )
    du_p = plan.pad3(du, plan.Nip, Dp)
    m_p = plan.row_stats(m, pad_value=1e30)
    l_p = plan.row_stats(l, pad_value=1.0)
    dvec_p = plan.row_stats(dvec)

    kw = dict(alpha=alpha, n_nodes=N, block_i=bi, block_j=bj,
              has_bias=has_bias, dropout_rate=dropout_rate)
    bias_spec_ij = (
        pl.BlockSpec((bi, bj), lambda b, i, j: (i, j))
        if has_bias
        else pl.BlockSpec((1, 1), lambda b, i, j: (0, 0))
    )

    # --- pass 1: dp + da (grid (B, Ni, Nj), j arbitrary) ---
    in_specs = [
        pl.BlockSpec((1, bi, Ep), lambda b, i, j: (b, i, 0)),    # p
        pl.BlockSpec((1, bj, Ep), lambda b, i, j: (b, j, 0)),    # q
        pl.BlockSpec((1, Ep), lambda b, i, j: (0, 0)),           # a
        bias_spec_ij,                                            # bias
        pl.BlockSpec((1, bj, Dp), lambda b, i, j: (b, j, 0)),    # v
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # dropout seed
        pl.BlockSpec((1, bi, 128), lambda b, i, j: (b, i, 0)),   # m
        pl.BlockSpec((1, bi, 128), lambda b, i, j: (b, i, 0)),   # l
        pl.BlockSpec((1, bi, Dp), lambda b, i, j: (b, i, 0)),    # du
        pl.BlockSpec((1, bi, 128), lambda b, i, j: (b, i, 0)),   # dvec
    ]
    operands = [p_p, q_p, a_p, bias_p, v_p, seed_p, m_p, l_p, du_p, dvec_p]
    dp_pad, da_part = pl.pallas_call(
        functools.partial(_bwd_dp_da_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((B, plan.Nip, Ep), p.dtype),
            jax.ShapeDtypeStruct((B, ni * 8, Ep), jnp.float32),
        ),
        grid=(B, ni, plan.nj),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bi, Ep), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 8, Ep), lambda b, i, j: (b, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bi, Ep), jnp.float32),
            pltpu.VMEM((8, Ep), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    dp = dp_pad[:, :N, :E]
    da = jnp.sum(da_part, axis=(0, 1))[:E]

    # --- pass 2: dq + dv (grid (B, Nj, Ni), i arbitrary) ---
    bias_spec_ji = (
        pl.BlockSpec((bi, bj), lambda b, j, i: (i, j))
        if has_bias
        else pl.BlockSpec((1, 1), lambda b, j, i: (0, 0))
    )
    in_specs2 = [
        pl.BlockSpec((1, bi, Ep), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bj, Ep), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, Ep), lambda b, j, i: (0, 0)),
        bias_spec_ji,
        pl.BlockSpec((1, bj, Dp), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # dropout seed
        pl.BlockSpec((1, bi, 128), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bi, 128), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bi, Dp), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bi, 128), lambda b, j, i: (b, i, 0)),
    ]
    dq_pad, dv_pad = pl.pallas_call(
        functools.partial(_bwd_dq_dv_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, Ep), q.dtype),
            jax.ShapeDtypeStruct((B, Np, Dp), v.dtype),
        ),
        grid=(B, plan.nj, ni),
        in_specs=in_specs2,
        out_specs=(
            pl.BlockSpec((1, bj, Ep), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bj, Dp), lambda b, j, i: (b, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bj, Ep), jnp.float32),
            pltpu.VMEM((bj, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    dq = dq_pad[:, :N, :E]
    dv = dv_pad[:, :N, :D]

    if not has_bias:
        return dp, dq, da, None, dv

    # --- pass 3: dbias (grid (Ni, Nj, B), batch arbitrary) ---
    in_specs3 = [
        pl.BlockSpec((1, bi, Ep), lambda i, j, b: (b, i, 0)),
        pl.BlockSpec((1, bj, Ep), lambda i, j, b: (b, j, 0)),
        pl.BlockSpec((1, Ep), lambda i, j, b: (0, 0)),
        pl.BlockSpec((bi, bj), lambda i, j, b: (i, j)),
        pl.BlockSpec((1, bj, Dp), lambda i, j, b: (b, j, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # dropout seed
        pl.BlockSpec((1, bi, 128), lambda i, j, b: (b, i, 0)),
        pl.BlockSpec((1, bi, 128), lambda i, j, b: (b, i, 0)),
        pl.BlockSpec((1, bi, Dp), lambda i, j, b: (b, i, 0)),
        pl.BlockSpec((1, bi, 128), lambda i, j, b: (b, i, 0)),
    ]
    dbias_pad = pl.pallas_call(
        functools.partial(_bwd_dbias_kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((plan.Nip, Np), bias.dtype),
        grid=(ni, plan.nj, B),
        in_specs=in_specs3,
        out_specs=pl.BlockSpec((bi, bj), lambda i, j, b: (i, j)),
        scratch_shapes=[pltpu.VMEM((bi, bj), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    dbias = dbias_pad[:N, :N]
    return dp, dq, da, dbias, dv


def _dense_reference(p, q, a, bias, v, alpha, keep=None, dropout_rate=0.0):
    scores = gatv2_scores_dense(p, q, a, alpha)
    return gat_aggregate_dense(
        scores, v, bias, dropout_rate=dropout_rate, keep_mask=keep
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused(p, q, a, bias, v, seed, alpha, interpret, dropout_rate):
    return _fused_forward(
        p, q, a, bias, v, alpha, interpret,
        seed=seed, dropout_rate=dropout_rate,
    )


def _fused_fwd(p, q, a, bias, v, seed, alpha, interpret, dropout_rate):
    out, u, m, l = _fused_forward(
        p, q, a, bias, v, alpha, interpret, with_residuals=True,
        seed=seed, dropout_rate=dropout_rate,
    )
    return out, (p, q, a, bias, v, seed, u, m, l)


def _fused_bwd(alpha, interpret, dropout_rate, res, g):
    p, q, a, bias, v, seed, u, m, l = res
    dp, dq, da, dbias, dv = _fused_backward(
        p, q, a, bias, v, u, m, l, g, alpha, interpret,
        seed=seed, dropout_rate=dropout_rate,
    )
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)  # int primal
    return dp, dq, da, dbias, dv, dseed


_fused.defvjp(_fused_fwd, _fused_bwd)


def gatv2_attention_fused(
    p: jax.Array,
    q: jax.Array,
    a: jax.Array,
    bias: Optional[jax.Array],
    v: jax.Array,
    alpha: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused GATv2 attention, forward and backward, including in-kernel
    attention-weight dropout (hash-derived mask, reference placement) — the
    training hot path at flagship defaults (dropout 0.3)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = jax.random.bits(dropout_rng, (), jnp.uint32).reshape(1, 1)
        rate = float(dropout_rate)
    else:
        seed = jnp.zeros((1, 1), jnp.uint32)
        rate = 0.0
    return _fused(p, q, a, bias, v, seed, float(alpha), bool(interpret), rate)
