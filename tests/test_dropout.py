"""Dropout semantics: inverted dropout on attention weights (reference
modules.py:90 torch.dropout), train vs eval behavior, determinism by key."""

import numpy as np

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.models import MTADGAT
from mtad_gat_tpu.nn import FeatureAttention


def test_eval_mode_ignores_dropout():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 5)), jnp.float32)
    layer = FeatureAttention(n_features=5, window_size=10, dropout=0.5, alpha=0.2)
    params = layer.init(jax.random.PRNGKey(0), x)
    a = layer.apply(params, x, deterministic=True)
    b = layer.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_is_stochastic_and_keyed():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 5)), jnp.float32)
    layer = FeatureAttention(n_features=5, window_size=10, dropout=0.5, alpha=0.2)
    params = layer.init(jax.random.PRNGKey(0), x)
    r1 = layer.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    r2 = layer.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    r1b = layer.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r1b))  # keyed determinism


def test_dropout_is_inverted_scaling():
    """E[dropout(att)] == att (inverted dropout, matching torch): check the
    pre-sigmoid aggregation mean over many keys."""
    from mtad_gat_tpu.graph.ops import gat_aggregate_dense

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((1, 6, 6)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((1, 6, 8)), jnp.float32)

    base = np.asarray(gat_aggregate_dense(scores, values, None))
    acc = np.zeros_like(base)
    n = 600
    for i in range(n):
        out = gat_aggregate_dense(
            scores, values, None, dropout_rate=0.3,
            dropout_rng=jax.random.PRNGKey(i),
        )
        acc += np.asarray(out)
    # sigmoid is nonlinear, so compare means loosely: the dropped aggregation
    # must be an unbiased estimate of the undropped weighted sum pre-sigmoid;
    # post-sigmoid means should be close for moderate variance
    np.testing.assert_allclose(acc / n, base, atol=0.08)


def test_pallas_kernel_dropout_matches_hash_oracle():
    """The fused kernel's in-kernel dropout (forward AND all five gradients)
    equals the dense path with the same hash-derived mask applied
    post-softmax without renormalization."""
    from mtad_gat_tpu.kernels.gat_pallas import (
        _dense_reference, gatv2_attention_fused, hash_keep_mask,
    )

    rng = np.random.default_rng(0)
    B, N, E, D = 2, 55, 48, 20
    p = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(E), jnp.float32)
    bias = jnp.asarray(0.2 * rng.standard_normal((N, N)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    key = jax.random.PRNGKey(3)
    rate = 0.3

    seed = jax.random.bits(key, (), jnp.uint32).reshape(1, 1)
    keep = hash_keep_mask(seed[0, 0], B, N, N, rate)
    out = gatv2_attention_fused(p, q, a, bias, v, 0.2,
                                dropout_rate=rate, dropout_rng=key)
    want = _dense_reference(p, q, a, bias, v, 0.2, keep=keep, dropout_rate=rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def loss_fused(p, q, a, bias, v):
        return jnp.sum(
            gatv2_attention_fused(p, q, a, bias, v, 0.2,
                                  dropout_rate=rate, dropout_rng=key) ** 2
        )

    def loss_dense(p, q, a, bias, v):
        return jnp.sum(
            _dense_reference(p, q, a, bias, v, 0.2,
                             keep=keep, dropout_rate=rate) ** 2
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(p, q, a, bias, v)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(p, q, a, bias, v)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=3e-4, rtol=1e-3)


def test_pallas_hash_mask_statistics():
    """Keep rate is ~(1-p) and masks differ across seeds/batches."""
    from mtad_gat_tpu.kernels.gat_pallas import hash_keep_mask

    keep = np.asarray(hash_keep_mask(jnp.uint32(12345), 4, 128, 128, 0.3))
    frac = keep.mean()
    assert abs(frac - 0.7) < 0.01, frac
    assert not np.array_equal(keep[0], keep[1])  # batch-distinct
    keep2 = np.asarray(hash_keep_mask(jnp.uint32(54321), 4, 128, 128, 0.3))
    assert not np.array_equal(keep, keep2)       # seed-distinct


def test_pallas_impl_trains_with_dropout():
    """impl='pallas' + dropout 0.3 (the flagship default) runs the FUSED
    kernel in training: stochastic across keys, deterministic per key, and
    differentiable end-to-end."""
    cfg = MTADGATConfig(
        n_features=8, window_size=16, out_dim=8, gru_hid_dim=12,
        forecast_n_layers=1, forecast_hid_dim=12, recon_n_layers=1,
        recon_hid_dim=12, dropout=0.3, attention_impl="pallas",
    )
    model = MTADGAT(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]

    def loss(params, key):
        preds, recons = model.apply(
            {"params": params}, x, deterministic=False, rngs={"dropout": key}
        )
        return jnp.sum(preds ** 2) + jnp.sum(recons ** 2)

    l1, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(1))
    l1b = loss(params, jax.random.PRNGKey(1))
    l2 = loss(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1))
    assert float(l1) == float(l1b)       # keyed determinism
    assert float(l1) != float(l2)        # stochastic across keys
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)


def test_full_model_dropout_paths():
    """Every dropout site (attention x2, GRU inter-layer, MLP, recon decoder)
    runs under a single 'dropout' rng collection without shape errors."""
    cfg = MTADGATConfig(
        n_features=5, window_size=10, out_dim=5, gru_n_layers=2,
        gru_hid_dim=12, forecast_n_layers=2, forecast_hid_dim=12,
        recon_n_layers=2, recon_hid_dim=12, dropout=0.4,
    )
    model = MTADGAT(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 10, 5)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    preds, recons = model.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)}
    )
    assert np.isfinite(np.asarray(preds)).all()
    assert np.isfinite(np.asarray(recons)).all()
