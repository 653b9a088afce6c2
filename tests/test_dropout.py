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
