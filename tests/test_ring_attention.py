"""Ring attention over a sharded node set must equal the dense oracle
exactly (complete-graph softmax attention is order-invariant)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mtad_gat_tpu.graph.ops import gat_aggregate_dense, gatv2_scores_dense
from mtad_gat_tpu.parallel import make_mesh
from mtad_gat_tpu.parallel.ring_attention import ring_gatv2_attention


def _case(rng, b, n, e, d):
    p = jnp.asarray(rng.standard_normal((b, n, e)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, n, e)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(e), jnp.float32)
    bias = jnp.asarray(0.2 * rng.standard_normal((n, n)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    return p, q, a, bias, v


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_dense(n_shards):
    assert len(jax.devices()) >= n_shards
    mesh = make_mesh(n_shards, model_parallel=n_shards)
    rng = np.random.default_rng(0)
    p, q, a, bias, v = _case(rng, b=2, n=32, e=24, d=16)

    want = gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, bias)
    got = ring_gatv2_attention(p, q, a, bias, v, 0.2, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_no_bias():
    mesh = make_mesh(4, model_parallel=4)
    rng = np.random.default_rng(1)
    p, q, a, _, v = _case(rng, b=1, n=16, e=8, d=8)
    want = gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, None)
    got = ring_gatv2_attention(p, q, a, None, v, 0.2, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_under_jit():
    """jit-compatible: the ring program compiles as one XLA program with
    ppermute collectives."""
    mesh = make_mesh(4, model_parallel=4)
    rng = np.random.default_rng(2)
    p, q, a, bias, v = _case(rng, b=1, n=16, e=8, d=8)

    fn = jax.jit(
        lambda p, q, a, bias, v: ring_gatv2_attention(p, q, a, bias, v, 0.2, mesh)
    )
    got = fn(p, q, a, bias, v)
    want = gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
