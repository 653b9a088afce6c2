"""General sparse-graph primitives: non-complete graphs through the COO
SDDMM -> segment softmax -> SpMM pipeline vs a masked-dense oracle."""

import numpy as np

import jax
import jax.numpy as jnp

from mtad_gat_tpu.graph import (
    Graph,
    complete_graph,
    gat_aggregate_coo,
    gatv2_scores_coo,
    gatv2_scores_dense,
    segment_softmax,
    segment_sum,
)


def ring_graph(n, hops=1):
    """Each node attends to itself and +/-hops neighbors (sorted by dst)."""
    src, dst = [], []
    for i in range(n):
        neigh = sorted({(i + d) % n for d in range(-hops, hops + 1)})
        for j in neigh:
            dst.append(i)
            src.append(j)
    return Graph(
        src=jnp.asarray(src, jnp.int32), dst=jnp.asarray(dst, jnp.int32), n_nodes=n
    )


def test_segment_softmax_normalizes():
    g = ring_graph(10, hops=2)
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal(g.n_edges), jnp.float32)
    w = segment_softmax(scores, g.dst, g.n_nodes)
    sums = np.asarray(segment_sum(w, g.dst, g.n_nodes))
    np.testing.assert_allclose(sums, np.ones(10), atol=1e-6)


def test_sparse_gat_matches_masked_dense():
    n, e, d, b = 12, 16, 8, 2
    g = ring_graph(n, hops=1)
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((b, n, e)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, n, e)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(e), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)

    # sparse path
    scores = gatv2_scores_coo(g, p, q, a, 0.2)
    out_sparse = gat_aggregate_coo(g, scores, v, None)

    # masked dense oracle: -inf scores off the edge set
    dense_scores = np.asarray(gatv2_scores_dense(p, q, a, 0.2))
    mask = np.full((n, n), -np.inf)
    mask[np.asarray(g.dst), np.asarray(g.src)] = 0.0
    att = jax.nn.softmax(jnp.asarray(dense_scores + mask[None]), axis=2)
    out_dense = jax.nn.sigmoid(jnp.einsum("bij,bjd->bid", att, v))

    np.testing.assert_allclose(
        np.asarray(out_sparse), np.asarray(out_dense), atol=1e-5
    )


def test_complete_graph_edge_layout():
    g = complete_graph(4)
    assert g.n_edges == 16
    # sorted by dst, contiguous segments
    dst = np.asarray(g.dst)
    assert (np.diff(dst) >= 0).all()
    g2 = complete_graph(4, self_loops=False)
    assert g2.n_edges == 12
    assert not np.any(np.asarray(g2.src) == np.asarray(g2.dst))
