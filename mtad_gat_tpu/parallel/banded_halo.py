"""Sequence-parallel banded attention via halo exchange.

The TPU-native way to scale BANDED temporal attention across chips. Ring
attention (``ring_attention.py``) rotates every key/value block around the
full ring because complete-graph attention needs all-pairs visibility — S-1
ppermute hops per layer. A banded graph (|i-j| <= W) needs none of that:
with the timestamp axis sharded contiguously over the ``model`` mesh axis,
each shard's queries only ever attend keys within W positions, i.e. its own
block plus a W-row HALO from each immediate neighbor. Communication is two
fixed-size ppermutes (2·W rows) per layer, independent of the shard count —
the cost profile of a stencil/convolution, not of attention.

Locally each shard runs the same O(1)-program-size block-scan online-softmax
attention as the single-chip path (``graph/ops.py:banded_attention_scan``)
over its halo-extended block, with a ``key_valid`` mask killing
out-of-sequence halo rows (the wrap-around blocks the edge shards receive)
and padding. Results are bit-comparable to the single-device banded path at
identical params (tested on the CPU farm, including shard counts that do
not divide N).

Wired into the model as ``attention_impl="ring"`` with a banded temporal
graph (``nn/gat.py:_GATCore``): "ring" is the sequence-parallel impl knob;
complete graphs get the rotating ring, banded graphs get the halo exchange.
Requires W <= ceil(N/S) (halos from immediate neighbors only); wider bands
fall back to the GSPMD-sharded scan path.

Reference counterpart: none (single device, ``training.py:60,77``) — this is
SURVEY.md §2.7's sequence/context parallelism for the long-window regime.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtad_gat_tpu.graph.ops import banded_attention_scan
from mtad_gat_tpu.parallel.ring_attention import _shard_map


def banded_halo_attention(
    p: jax.Array,            # GATv2: (b, N, e) query proj; GATv1: (b, N)
    q: jax.Array,            # GATv2: (b, N, e) key proj;   GATv1: (b, N)
    a: Optional[jax.Array],  # GATv2: (e,); GATv1: None
    bias_band: Optional[jax.Array],  # (N, 2W+1) banded score bias, or None
    v: jax.Array,            # (b, N, d)
    alpha: float,
    bandwidth: int,
    mesh: Mesh,
    axis: str = "model",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Banded GAT attention with the node axis sharded over ``axis``.

    Exactly the single-device banded attention (parity-tested); dropout
    folds the rng per shard, so training masks differ from the single-chip
    stream (same rate — the usual data-parallel caveat)."""
    S = mesh.shape[axis]
    N = p.shape[1]
    nl = -(-N // S)                  # local block length
    assert bandwidth <= nl, (
        f"halo attention needs bandwidth <= N/S rows per shard "
        f"(got W={bandwidth}, local block {nl}); use the GSPMD scan path"
    )
    W = bandwidth
    n_pad = nl * S
    pad = n_pad - N
    has_bias = bias_band is not None
    gatv2 = a is not None
    a_arr = a if gatv2 else jnp.zeros((1,), jnp.float32)  # shard_map arg
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if not use_dropout:
        dropout_rng = jax.random.PRNGKey(0)   # stable signature placeholder

    def padn(x):
        if pad == 0:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[1] = (0, pad)
        return jnp.pad(x, cfg)

    p, q, v = padn(p), padn(q), padn(v)
    if has_bias:
        bias_band = jnp.pad(bias_band, ((0, pad), (0, 0))) if pad else bias_band
    else:
        bias_band = jnp.zeros((n_pad, 1), jnp.float32)  # row-sharded dummy

    node_spec = P(None, axis) if p.ndim == 2 else P(None, axis, None)
    vspec = P(None, axis, None)
    bias_spec = P(axis, None)

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=(node_spec, node_spec, P(), bias_spec, vspec, P()),
        out_specs=vspec,
    )
    def run(p_l, q_l, a_r, bias_l, v_l, rng):
        rank = jax.lax.axis_index(axis)

        def with_halos(x):
            # left halo = my left neighbor's LAST W rows; right halo = my
            # right neighbor's FIRST W rows. Each is one fixed-size
            # neighbor ppermute over ICI; edge wrap-around is invalidated
            # by key_valid below.
            fwd = [(i, (i + 1) % S) for i in range(S)]
            bwd = [(i, (i - 1) % S) for i in range(S)]
            left = jax.lax.ppermute(x[:, -W:], axis, fwd)
            right = jax.lax.ppermute(x[:, :W], axis, bwd)
            return jnp.concatenate([left, x, right], axis=1)

        q_ext = with_halos(q_l)
        v_ext = with_halos(v_l)
        # queries padded with W dead rows each side so extended position
        # t attends |t - j| <= W in extended coordinates == the original
        # band in global coordinates; dead/halo rows are sliced off after
        zcfg = [(0, 0)] * p_l.ndim
        zcfg[1] = (W, W)
        p_ext = jnp.pad(p_l, zcfg)

        # extended position t holds global node rank*nl + (t - W)
        g = rank * nl + jnp.arange(nl + 2 * W) - W
        key_valid = (g >= 0) & (g < N)

        if has_bias:
            bias_ext = jnp.pad(bias_l, ((W, W), (0, 0)))
        else:
            bias_ext = None

        rng_l = jax.random.fold_in(rng, rank) if use_dropout else None
        out = banded_attention_scan(
            p_ext, q_ext, a_r if gatv2 else None, bias_ext, v_ext, alpha, W,
            dropout_rate=dropout_rate if use_dropout else 0.0,
            dropout_rng=rng_l,
            bias_storage="band",
            key_valid=key_valid,
        )
        return out[:, W : W + nl]

    con = jax.lax.with_sharding_constraint
    p = con(p, NamedSharding(mesh, node_spec))
    q = con(q, NamedSharding(mesh, node_spec))
    v = con(v, NamedSharding(mesh, vspec))
    bias_band = con(bias_band, NamedSharding(mesh, bias_spec))
    out = run(p, q, a_arr, bias_band, v, dropout_rng)
    return out[:, :N, :] if pad else out
