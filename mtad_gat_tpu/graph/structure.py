"""Graph containers.

The reference only ever uses *complete* graphs — all-pairs attention over k
feature nodes (``modules.py:97-122``) and n timestamp nodes
(``modules.py:195-217``). This framework generalizes to arbitrary COO edge
lists so the same SDDMM -> segment-softmax -> SpMM pipeline runs on sparse
graphs; the complete graph is just one instantiation (and the parity oracle).

Edges are stored destination-major and sorted by destination so that
per-destination segments are contiguous — that is what makes segment ops and
edge partitioning across mesh shards cheap on TPU (static shapes, monotone
segment ids).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Graph(NamedTuple):
    """COO edge list, sorted by ``dst`` (segment ids are ``dst``).

    senders/receivers follow message-passing convention: the edge (src -> dst)
    contributes src's features to dst's aggregation. For GAT attention over a
    row-softmax(dim=2) like the reference (``modules.py:89``), dst = i (query
    node), src = j (key node).
    """

    src: jax.Array   # (E,) int32
    dst: jax.Array   # (E,) int32
    n_nodes: int     # static

    @property
    def n_edges(self) -> int:
        return self.src.shape[0]


def complete_graph(n_nodes: int, self_loops: bool = True) -> Graph:
    """All-pairs graph matching the reference's dense attention (including
    self-loops: the reference concatenates v_i || v_i too, ``modules.py:101``)."""
    dst, src = np.meshgrid(np.arange(n_nodes), np.arange(n_nodes), indexing="ij")
    dst = dst.reshape(-1)
    src = src.reshape(-1)
    if not self_loops:
        keep = dst != src
        dst, src = dst[keep], src[keep]
    return Graph(
        src=jnp.asarray(src, jnp.int32),
        dst=jnp.asarray(dst, jnp.int32),
        n_nodes=n_nodes,
    )


def graph_from_edges(src, dst, n_nodes: int) -> Graph:
    """Build a dst-sorted Graph from arbitrary (src, dst) index sequences."""
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    assert src.shape == dst.shape and src.ndim == 1
    if src.size:
        assert src.min() >= 0 and src.max() < n_nodes
        assert dst.min() >= 0 and dst.max() < n_nodes
    order = np.argsort(dst, kind="stable")
    return Graph(
        src=jnp.asarray(src[order]),
        dst=jnp.asarray(dst[order]),
        n_nodes=n_nodes,
    )


def banded_edges(n_nodes: int, bandwidth: int, self_loops: bool = True) -> tuple:
    """Static ``(src, dst)`` tuples of the banded topology: node i attends to
    |i-j| <= bandwidth. The natural sparse TEMPORAL graph — the local
    generalization of the reference's all-pairs temporal attention
    (``modules.py:195-217``); O(n·bandwidth) edges instead of O(n²)."""
    assert bandwidth >= 0
    i = np.arange(n_nodes)
    offs = np.arange(-bandwidth, bandwidth + 1)
    dst = np.repeat(i, offs.size)
    src = (dst + np.tile(offs, n_nodes)).astype(np.int64)
    keep = (src >= 0) & (src < n_nodes)
    if not self_loops:
        keep &= src != dst
    src, dst = src[keep], dst[keep]
    order = np.argsort(dst, kind="stable")
    return (
        tuple(int(s) for s in src[order]),
        tuple(int(d) for d in dst[order]),
    )


def banded_graph(n_nodes: int, bandwidth: int, self_loops: bool = True) -> Graph:
    """Graph form of :func:`banded_edges`."""
    src, dst = banded_edges(n_nodes, bandwidth, self_loops)
    return graph_from_edges(src, dst, n_nodes)


def knn_edges_from_series(
    series: np.ndarray, k: int
) -> tuple:
    """k-NN FEATURE graph from training data: neighbors are the k most
    |Pearson-correlated| features (plus the self-loop, which the reference's
    complete graph always includes). Returns static ``(src, dst)`` tuples
    suitable for ``MTADGATConfig.feature_edges`` — computed once on host,
    deterministic given the data. Generalizes the reference's complete
    feature graph (``modules.py:97-122``) to data-driven sparsity."""
    series = np.asarray(series, np.float64)
    assert series.ndim == 2, "series must be (time, features)"
    n = series.shape[1]
    k = min(k, n - 1)
    # guard constant features: corrcoef yields NaN rows; treat as uncorrelated
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.abs(np.corrcoef(series.T))
    corr = np.nan_to_num(corr, nan=0.0)
    np.fill_diagonal(corr, -np.inf)  # self handled explicitly below
    src_list, dst_list = [], []
    for i in range(n):
        neigh = np.argpartition(-corr[i], k - 1)[:k] if k > 0 else np.array([], int)
        neigh = np.sort(neigh)
        src_list.extend([i])            # self-loop first
        dst_list.extend([i])
        src_list.extend(int(j) for j in neigh)
        dst_list.extend([i] * len(neigh))
    order = np.argsort(np.asarray(dst_list), kind="stable")
    src_arr = np.asarray(src_list)[order]
    dst_arr = np.asarray(dst_list)[order]
    return tuple(int(s) for s in src_arr), tuple(int(d) for d in dst_arr)


def parse_graph_spec(spec: str) -> tuple:
    """Parse a graph-topology spec string into (kind, param).

    - ``"complete"``      -> ("complete", None): the reference's all-pairs graph
    - ``"band:W"``        -> ("band", W): banded graph, |i-j| <= W
    - ``"knn:K"``         -> ("knn", K): data-driven k-NN graph (feature axis)
    """
    if spec == "complete":
        return "complete", None
    for kind in ("band", "knn"):
        prefix = kind + ":"
        if spec.startswith(prefix):
            try:
                param = int(spec[len(prefix):])
            except ValueError:
                raise ValueError(f"bad graph spec {spec!r}: {kind} parameter "
                                 "must be an integer") from None
            if param < 1:
                raise ValueError(f"bad graph spec {spec!r}: parameter must be >= 1")
            return kind, param
    raise ValueError(
        f"unknown graph spec {spec!r}; expected 'complete', 'band:W' or 'knn:K'"
    )
