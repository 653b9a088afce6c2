"""Blockwise flash backward: gradients must match the dense oracle across
multi-block shapes (several i/j blocks), no-bias mode, and batch > 1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.graph.ops import gat_aggregate_dense, gatv2_scores_dense
from mtad_gat_tpu.kernels.gat_pallas import _fused

_NOSEED = jnp.zeros((1, 1), jnp.uint32)  # dropout off


def _case(rng, b, n, e, d, with_bias=True):
    p = jnp.asarray(rng.standard_normal((b, n, e)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, n, e)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(e), jnp.float32)
    bias = (
        jnp.asarray(0.1 * rng.standard_normal((n, n)), jnp.float32)
        if with_bias else None
    )
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    return p, q, a, bias, v


def _dense(p, q, a, bias, v):
    return gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, bias)


@pytest.mark.parametrize("n,e,d,b", [
    (20, 24, 12, 1),      # single block
    (130, 40, 20, 2),     # two i/j blocks + batch accumulation (dbias)
    (100, 200, 38, 2),    # flagship temporal-ish shapes, several e-chunks
])
def test_backward_matches_dense(n, e, d, b):
    rng = np.random.default_rng(0)
    p, q, a, bias, v = _case(rng, b, n, e, d)
    g = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)

    def loss_fused(p, q, a, bias, v):
        return jnp.sum(_fused(p, q, a, bias, v, _NOSEED, 0.2, True, 0.0) * g)

    def loss_dense(p, q, a, bias, v):
        return jnp.sum(_dense(p, q, a, bias, v) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(p, q, a, bias, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(p, q, a, bias, v)
    names = ["dp", "dq", "da", "dbias", "dv"]
    for name, x, y in zip(names, gf, gd):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-5, err_msg=name
        )


def test_backward_no_bias():
    rng = np.random.default_rng(1)
    p, q, a, _, v = _case(rng, 1, 40, 16, 8, with_bias=False)
    g = jnp.asarray(rng.standard_normal((1, 40, 8)), jnp.float32)

    gf = jax.grad(
        lambda p, q, a, v: jnp.sum(_fused(p, q, a, None, v, _NOSEED, 0.2, True, 0.0) * g),
        argnums=(0, 1, 2, 3),
    )(p, q, a, v)
    gd = jax.grad(
        lambda p, q, a, v: jnp.sum(_dense(p, q, a, None, v) * g),
        argnums=(0, 1, 2, 3),
    )(p, q, a, v)
    for x, y in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-5)
