"""Graph-attention layers over complete node graphs.

Reference semantics (``modules.py:25-217``), reproduced exactly:

- FeatureAttention: nodes are *features*; a node's representation is that
  feature's values across the window (reference permutes to (b,k,n) at
  ``modules.py:69``). Complete graph over k nodes.
- TemporalAttention: nodes are *timestamps*; a node is all feature values at
  one timestamp (``modules.py:168``). Complete graph over n nodes.
- GATv2: linear-after-concat scoring with leakyrelu before the attention
  vector (``modules.py:74-77``); embed dim is doubled (``modules.py:48,149``).
- GATv1: linear-first scoring, leakyrelu after (``modules.py:80-83``).
- Learnable (N,N) score bias (``modules.py:59-60,160-161``), softmax over the
  key axis, dropout on attention weights, sigmoid output
  (``modules.py:85-93``).

TPU-native design: scores are computed in decomposed form (p_i + q_j) so the
reference's (b,N,N,2d) repeat_interleave concat tensor is never built; the
attention itself dispatches to a dense XLA path, a Pallas fused blockwise
kernel, or a COO sparse path (see ``graph/ops.py`` and
``kernels/gat_pallas.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mtad_gat_tpu.graph import (
    BAND_UNROLL_CUTOFF,
    banded_attention_scan,
    banded_bias_to_full,
    banded_edges,
    complete_graph,
    gat_aggregate_coo,
    gat_aggregate_dense,
    gatv1_banded_attention,
    gatv1_scores_coo,
    gatv1_scores_dense,
    gatv2_banded_attention,
    gatv2_scores_coo,
    gatv2_scores_dense,
    graph_from_edges,
    parse_graph_spec,
)
from mtad_gat_tpu.nn.init import (
    torch_linear_bias,
    torch_linear_kernel,
    xavier_uniform_gain,
)
from mtad_gat_tpu.parallel.sharding import constrain

# Above this (b, N, N) f32 score-tensor size, attention_impl="dense" on a
# GATv2 complete graph auto-routes to the fused Pallas kernel: measured on
# the 16 GB bench chip, dense OOMs at N=65,536/b=1 (17.2 GB scores) while
# the blockwise kernel peaks at 0.09 GiB and keeps running
# (bench_edges.py --crossover; docs/PERFORMANCE.md). Set to an int to pin
# the threshold; None (default) derives 7/8 of the attached device's HBM
# when the runtime reports it, else falls back to 14 GiB (the remote-attach
# tunnel exposes no memory_stats). NOTE: under a vmapped entity axis
# (MultiEntityTrainer) the batch dim excludes the entity axis, so the
# estimate undercounts by n_entities — pin explicitly for huge complete
# graphs in fleet training.
PALLAS_AUTO_SCORE_BYTES = None
_PALLAS_AUTO_FALLBACK = 14 * 2**30
_device_limit_cache = []


def _pallas_auto_threshold() -> int:
    if PALLAS_AUTO_SCORE_BYTES is not None:
        return PALLAS_AUTO_SCORE_BYTES
    if not _device_limit_cache:
        limit = None
        try:
            stats = jax.devices()[0].memory_stats()
            limit = (stats or {}).get("bytes_limit")
        except Exception:
            limit = None
        _device_limit_cache.append(
            int(limit * 7 / 8) if limit else _PALLAS_AUTO_FALLBACK
        )
    return _device_limit_cache[0]


class _GATCore(nn.Module):
    """Attention over a complete graph of ``n_nodes`` nodes, each with
    ``node_dim`` input features."""

    n_nodes: int
    node_dim: int
    embed_dim: int          # effective (already doubled for GATv2)
    use_gatv2: bool
    alpha: float
    dropout: float
    use_bias: bool = True
    impl: str = "dense"     # "dense" | "sparse" | "pallas" | "ring"
    compute_dtype: jnp.dtype = jnp.float32
    # Non-complete topology: static (src, dst) COO tuples. When set, the
    # layer runs the general sparse SDDMM -> segment-softmax -> SpMM path
    # (graph/ops.py) — the complete graph is just the edges=None special
    # case (SURVEY.md §7 north star).
    edges: Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None
    # Banded topology (|i-j| <= band): under impl="dense" this routes to the
    # gather-free banded-dense layout (O(N·band) work, rolls instead of COO
    # gathers — docs/PERFORMANCE.md measures COO gathers at ~40x per-edge
    # cost): unrolled diagonal columns for band <= BAND_UNROLL_CUTOFF, the
    # O(1)-program-size block scan (flash-style online softmax) above it.
    # impl="sparse" keeps the COO oracle path.
    band: Optional[int] = None
    # Score-bias parameter storage when band is set: "full" keeps the
    # reference-style (N, N) matrix (param tree identical to the complete
    # graph), "band" stores only the (N, 2*band+1) diagonal band — O(N·W)
    # instead of O(N²), the long-window configuration.
    bias_storage: str = "full"

    @nn.compact
    def __call__(self, v: jax.Array, deterministic: bool = True) -> jax.Array:
        # v: (b, N, d) node features; nodes partitioned over the model axis
        # (edge partition of the complete graph into row blocks: each shard
        # owns the incoming edges of its nodes; softmax over keys is local,
        # key-side projections/values are all-gathered over ICI by GSPMD).
        d, e = self.node_dim, self.embed_dim
        cd = self.compute_dtype
        v = constrain(v.astype(cd), "data", "model", None)

        if self.use_gatv2:
            lin_in = 2 * d
            a_dim = e
        else:
            lin_in = d
            a_dim = 2 * e

        kernel = self.param("lin_kernel", torch_linear_kernel(lin_in), (lin_in, e))
        lin_bias = self.param("lin_bias", torch_linear_bias(lin_in), (e,))
        a = self.param("a", xavier_uniform_gain(1.414), (a_dim, 1))
        bias = None
        if self.use_bias:
            if self.bias_storage == "band":
                if self.band is None:
                    raise ValueError("bias_storage='band' requires a banded topology")
                bias_shape = (self.n_nodes, 2 * self.band + 1)
            else:
                bias_shape = (self.n_nodes, self.n_nodes)
            bias = self.param("bias", nn.initializers.zeros, bias_shape)

        dropout_rng = None
        if not deterministic and self.dropout > 0.0:
            dropout_rng = self.make_rng("dropout")

        a_flat = a[:, 0].astype(cd)

        # Resolve the COO graph: custom topology always routes sparse; the
        # complete graph routes sparse only when impl == "sparse" (the dense
        # einsum is faster for complete graphs, but the sparse path is the
        # general machinery and the parity oracle).
        graph = None
        if self.edges is not None:
            graph = graph_from_edges(self.edges[0], self.edges[1], self.n_nodes)
        elif self.impl == "sparse":
            graph = complete_graph(self.n_nodes)

        # COO paths gather bias[dst, src] from the dense matrix; expand
        # banded storage to the dense view for them (oracle path, small N)
        coo_bias = bias
        if bias is not None and self.bias_storage == "band" and graph is not None:
            coo_bias = banded_bias_to_full(bias, self.n_nodes, self.band)

        # Sequence-parallel banded attention: under impl="ring" with an
        # active model-parallel mesh, a banded graph shards the node axis
        # and exchanges W-row halos with neighbors (two fixed-size
        # ppermutes per layer — stencil communication, not ring rotation:
        # parallel/banded_halo.py). Falls through to the single-chip banded
        # paths when no mesh is active or the band exceeds the shard block.
        halo_mesh = None
        if self.band is not None and self.impl == "ring":
            from mtad_gat_tpu.parallel.sharding import current_mesh

            m = current_mesh()
            if m is not None and "model" in m.axis_names and m.shape["model"] > 1:
                n_local = -(-self.n_nodes // m.shape["model"])
                if self.band <= n_local:
                    halo_mesh = m

        def band_bias_rows():
            # halo path consumes banded (N, 2W+1) rows; convert full storage
            if bias is None or self.bias_storage == "band":
                return bias
            from mtad_gat_tpu.graph.ops import _banded_bias_cols

            return _banded_bias_cols(bias, self.n_nodes, self.band, "full")

        if self.use_gatv2:
            # lin([v_i || v_j]) == v_i @ K_left + v_j @ K_right + b
            p = v @ kernel[:d].astype(cd)                       # query side (i)
            q = v @ kernel[d:].astype(cd) + lin_bias.astype(cd)  # key side (j)
            if halo_mesh is not None:
                from mtad_gat_tpu.parallel.banded_halo import banded_halo_attention

                return banded_halo_attention(
                    p, q, a_flat, band_bias_rows(), v, self.alpha, self.band,
                    halo_mesh,
                    dropout_rate=self.dropout if dropout_rng is not None else 0.0,
                    dropout_rng=dropout_rng,
                ).astype(cd)
            if self.band is not None and self.impl in ("dense", "ring"):
                banded = (
                    gatv2_banded_attention
                    if self.band <= BAND_UNROLL_CUTOFF
                    else banded_attention_scan
                )
                return banded(
                    p, q, a_flat, bias, v, self.alpha, self.band,
                    dropout_rate=self.dropout if dropout_rng is not None else 0.0,
                    dropout_rng=dropout_rng,
                    bias_storage=self.bias_storage,
                ).astype(cd)
            if graph is not None:
                scores = gatv2_scores_coo(graph, p, q, a_flat, self.alpha)
                return gat_aggregate_coo(
                    graph, scores, v, coo_bias,
                    self.dropout if dropout_rng is not None else 0.0,
                    dropout_rng,
                ).astype(cd)
            # Auto-route huge complete graphs to the fused kernel: the dense
            # path's (b, N, N) f32 score tensor OOMs a 16 GB chip at
            # N=65,536 (measured: 17.2 GB; bench_edges.py --crossover),
            # while the blockwise kernel peaks at 0.09 GiB there. Below the
            # threshold dense is faster (3.1 vs 1.67 Ge/s at N=57k), so it
            # stays the default.
            score_bytes = 4 * v.shape[0] * self.n_nodes * self.n_nodes
            if self.impl == "pallas" or (
                self.impl == "dense"
                and score_bytes > _pallas_auto_threshold()
            ):
                from mtad_gat_tpu.kernels.gat_pallas import gatv2_attention_fused

                return gatv2_attention_fused(
                    p, q, a_flat, bias, v, self.alpha,
                    dropout_rate=self.dropout if dropout_rng is not None else 0.0,
                    dropout_rng=dropout_rng,
                ).astype(cd)
            if self.impl == "ring":
                from mtad_gat_tpu.parallel.ring_attention import ring_gatv2_attention
                from mtad_gat_tpu.parallel.sharding import current_mesh

                mesh = current_mesh()
                if mesh is not None and "model" in mesh.axis_names and mesh.shape["model"] > 1:
                    return ring_gatv2_attention(
                        p, q, a_flat, bias, v, self.alpha, mesh,
                        dropout_rate=self.dropout if dropout_rng is not None else 0.0,
                        dropout_rng=dropout_rng,
                    ).astype(cd)
                # no model-parallel mesh active: the dense path below is the
                # single-shard specialization of the ring (identical math)
            scores = gatv2_scores_dense(p, q, a_flat, self.alpha)
        else:
            wx = v @ kernel.astype(cd) + lin_bias.astype(cd)     # (b, N, e)
            if self.band is not None and self.impl in ("dense", "ring"):
                # rank-1 GATv1 scores: precompute the two halves once
                u = jnp.einsum(
                    "bne,e->bn", wx, a_flat[:e],
                    preferred_element_type=jnp.float32,
                )
                w = jnp.einsum(
                    "bne,e->bn", wx, a_flat[e:],
                    preferred_element_type=jnp.float32,
                )
                kw = dict(
                    dropout_rate=self.dropout if dropout_rng is not None else 0.0,
                    dropout_rng=dropout_rng,
                )
                if halo_mesh is not None:
                    from mtad_gat_tpu.parallel.banded_halo import (
                        banded_halo_attention,
                    )

                    return banded_halo_attention(
                        u, w, None, band_bias_rows(), v, self.alpha,
                        self.band, halo_mesh, **kw
                    ).astype(cd)
                kw["bias_storage"] = self.bias_storage
                if self.band <= BAND_UNROLL_CUTOFF:
                    return gatv1_banded_attention(
                        u, w, bias, v, self.alpha, self.band, **kw
                    ).astype(cd)
                return banded_attention_scan(
                    u, w, None, bias, v, self.alpha, self.band, **kw
                ).astype(cd)
            if graph is not None:
                scores = gatv1_scores_coo(
                    graph, wx, a_flat[:e], a_flat[e:], self.alpha
                )
                return gat_aggregate_coo(
                    graph, scores, v, coo_bias,
                    self.dropout if dropout_rng is not None else 0.0,
                    dropout_rng,
                ).astype(cd)
            scores = gatv1_scores_dense(wx, a_flat[:e], a_flat[e:], self.alpha)

        scores = constrain(scores, "data", "model", None)
        out = gat_aggregate_dense(
            scores.astype(cd), v, bias,
            self.dropout if dropout_rng is not None else 0.0, dropout_rng,
        ).astype(cd)
        return constrain(out, "data", "model", None)


class FeatureAttention(nn.Module):
    """GAT over the complete graph of k features (reference
    ``modules.py:25-122``). Input/output (b, n, k)."""

    n_features: int
    window_size: int
    dropout: float
    alpha: float
    embed_dim: Optional[int] = None
    use_gatv2: bool = True
    use_bias: bool = True
    impl: str = "dense"
    compute_dtype: jnp.dtype = jnp.float32
    graph_spec: str = "complete"   # "complete" | "knn:K" (edges required)
    edges: Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        kind, _ = parse_graph_spec(self.graph_spec)
        edges = None
        if kind == "knn":
            if self.edges is None:
                raise ValueError(
                    f"feature graph spec {self.graph_spec!r} is data-driven: "
                    "pass the (src, dst) edge tuples computed from the train "
                    "series (graph.knn_edges_from_series)"
                )
            edges = self.edges
        e = self.embed_dim if self.embed_dim is not None else self.window_size
        if self.use_gatv2:
            e *= 2
        v = jnp.swapaxes(x, 1, 2)  # (b, k, n): node = feature over window
        h = _GATCore(
            n_nodes=self.n_features,
            node_dim=self.window_size,
            embed_dim=e,
            use_gatv2=self.use_gatv2,
            alpha=self.alpha,
            dropout=self.dropout,
            use_bias=self.use_bias,
            impl=self.impl,
            compute_dtype=self.compute_dtype,
            edges=edges,
            name="core",
        )(v, deterministic=deterministic)
        return jnp.swapaxes(h, 1, 2)


class TemporalAttention(nn.Module):
    """GAT over the complete graph of n timestamps (reference
    ``modules.py:125-217``). Input/output (b, n, k)."""

    n_features: int
    window_size: int
    dropout: float
    alpha: float
    embed_dim: Optional[int] = None
    use_gatv2: bool = True
    use_bias: bool = True
    impl: str = "dense"
    compute_dtype: jnp.dtype = jnp.float32
    graph_spec: str = "complete"   # "complete" | "band:W"
    bias_storage: str = "full"     # "full" | "band" (O(N·W) bias param)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        kind, param = parse_graph_spec(self.graph_spec)
        band = param if kind == "band" else None
        # COO edge list needed only when the banded-dense/halo fast paths do
        # not apply (impl="sparse", the oracle path)
        edges = (
            banded_edges(self.window_size, param)
            if kind == "band" and self.impl == "sparse"
            else None
        )
        e = self.embed_dim if self.embed_dim is not None else self.n_features
        if self.use_gatv2:
            e *= 2
        return _GATCore(
            n_nodes=self.window_size,
            node_dim=self.n_features,
            embed_dim=e,
            use_gatv2=self.use_gatv2,
            alpha=self.alpha,
            dropout=self.dropout,
            use_bias=self.use_bias,
            impl=self.impl,
            compute_dtype=self.compute_dtype,
            edges=edges,
            band=band,
            bias_storage=self.bias_storage,
            name="core",
        )(x, deterministic=deterministic)
