"""Ring GATv2 attention: explicit blockwise attention over a sharded node set.

The GSPMD path (``constrain`` anchors in ``nn/gat.py``) lets XLA all-gather
the whole key side before computing — fine when N is small. This module is
the *scalable* alternative for large node counts / long windows: node blocks
stay sharded over the ``model`` mesh axis, and each step every shard

  1. computes attention of its local query rows against the key/value block
     it currently holds (online-softmax update), and
  2. rotates that key/value block to its ring neighbor with ``ppermute``,

so peak memory per chip is O(N/S) rows and the block exchange rides ICI
neighbor links, overlapped by XLA with the local score/aggregation work.
After S steps every shard has seen every block and holds the exact softmax
aggregate of the full complete-graph attention — identical math to the dense
oracle (tested), never materializing an (N, N) score matrix on any chip.

This is the sequence/context-parallel form of the temporal GAT (nodes =
timestamps) and the edge-partition form of the feature GAT (nodes =
features): SURVEY.md §2.7. It is wired into the model as
``attention_impl="ring"`` (``nn/gat.py:_GATCore``), usable from ``RunConfig``
/ the ``--attention_impl`` CLI flag whenever a mesh with a ``model`` axis is
active.

Node counts that do not divide the shard count are zero-padded: padded key
columns are masked to -inf before the online-softmax update and padded query
rows are sliced off afterwards, so any (N, S) combination is exact.

Attention-weight dropout matches the reference's placement — applied to the
softmaxed weights withOUT renormalizing (``modules.py:89-90``): the softmax
denominator accumulates unmasked scores while the aggregate accumulates
masked ones, which streams exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map(f, mesh, in_specs, out_specs):
    """Version shim: jax>=0.8 uses jax.shard_map(check_vma=...), older
    releases jax.experimental.shard_map.shard_map(check_rep=...)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def _scores(p_blk: jax.Array, q_blk: jax.Array, a: jax.Array, alpha: float) -> jax.Array:
    """Local GATv2 scores: (b, I, e) x (b, J, e) -> (b, I, J)."""
    z = p_blk[:, :, None, :] + q_blk[:, None, :, :]
    z = jax.nn.leaky_relu(z, negative_slope=alpha)
    return jnp.einsum("bije,e->bij", z, a, preferred_element_type=jnp.float32)


def ring_gatv2_attention(
    p: jax.Array,            # (b, N, e) query-side projections
    q: jax.Array,            # (b, N, e) key-side projections (+lin bias)
    a: jax.Array,            # (e,)
    bias: Optional[jax.Array],   # (N, N) or None
    v: jax.Array,            # (b, N, d)
    alpha: float,
    mesh: Mesh,
    axis: str = "model",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """sigmoid(softmax_j(a . leakyrelu(p_i+q_j) + bias_ij) @ v) with the node
    dimension sharded over ``axis`` and key/value blocks rotated on a ring.
    Works inside or outside jit (shardings are expressed as constraints)."""
    n_shards = mesh.shape[axis]
    N = p.shape[1]
    nl = -(-N // n_shards)           # ceil: local block size
    n_pad = nl * n_shards
    pad = n_pad - N
    has_bias = bias is not None
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if not use_dropout:
        dropout_rng = jax.random.PRNGKey(0)  # placeholder for a stable signature

    if pad:
        p = jnp.pad(p, ((0, 0), (0, pad), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        if has_bias:
            bias = jnp.pad(bias, ((0, pad), (0, pad)))
    if bias is None:
        bias = jnp.zeros((n_pad, 1), p.dtype)  # placeholder, row-sharded

    node_spec = P(None, axis, None)
    bias_spec = P(axis, None)

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=(node_spec, node_spec, P(), bias_spec, node_spec, P()),
        out_specs=node_spec,
    )
    def run(p_l, q_l, a_r, bias_l, v_l, rng):
        # p_l: (b, nl, e) local query rows; q_l/v_l: local key/value block
        rank = jax.lax.axis_index(axis)
        b = p_l.shape[0]
        d = v_l.shape[-1]
        m = jnp.full((b, nl, 1), -1e30, jnp.float32)
        l = jnp.zeros((b, nl, 1), jnp.float32)
        acc = jnp.zeros((b, nl, d), jnp.float32)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        q_blk, v_blk = q_l, v_l
        for step in range(n_shards):
            # block currently held came from shard (rank - step) mod S
            src = (rank - step) % n_shards
            s = _scores(p_l, q_blk, a_r, alpha)           # (b, nl, nl)
            if has_bias:
                cols = jax.lax.dynamic_slice(bias_l, (0, src * nl), (nl, nl))
                s = s + cols.astype(s.dtype)[None]
            if pad:
                # mask key columns beyond the true node count
                col_ids = src * nl + jnp.arange(nl)
                s = jnp.where(col_ids[None, None, :] < N, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
            corr = jnp.exp(m - m_new)
            e_s = jnp.exp(s - m_new)
            # softmax denominator over the FULL (unmasked) weights
            l = l * corr + jnp.sum(e_s, axis=2, keepdims=True)
            e_agg = e_s
            if use_dropout:
                # reference drops softmaxed weights without renormalizing
                # (modules.py:89-90): mask only the aggregate, not l
                tile_key = jax.random.fold_in(rng, rank * n_shards + src)
                keep = jax.random.bernoulli(
                    tile_key, 1.0 - dropout_rate, e_s.shape
                )
                e_agg = jnp.where(keep, e_s / (1.0 - dropout_rate), 0.0)
            acc = acc * corr + jnp.einsum(
                "bij,bjd->bid", e_agg, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            m = m_new
            if step + 1 < n_shards:
                # rotate the k/v block to the next shard; XLA overlaps this
                # ICI transfer with the next local block's compute
                q_blk = jax.lax.ppermute(q_blk, axis, perm)
                v_blk = jax.lax.ppermute(v_blk, axis, perm)

        return jax.nn.sigmoid(acc / l).astype(v_l.dtype)

    sharding = NamedSharding(mesh, node_spec)
    con = jax.lax.with_sharding_constraint
    p = con(p, sharding)
    q = con(q, sharding)
    v = con(v, sharding)
    bias = con(bias, NamedSharding(mesh, bias_spec))
    out = run(p, q, a, bias, v, dropout_rng)
    return out[:, :N, :] if pad else out
