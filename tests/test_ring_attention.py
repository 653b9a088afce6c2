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


@pytest.mark.parametrize("n", [10, 55, 100])
def test_ring_pads_non_divisible_node_counts(n):
    """Node counts that don't divide the shard count are masked-padded and
    stay exact (flagship feature GAT has k=55)."""
    mesh = make_mesh(4, model_parallel=4)
    rng = np.random.default_rng(3)
    p, q, a, bias, v = _case(rng, b=2, n=n, e=12, d=8)
    want = gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, bias)
    got = ring_gatv2_attention(p, q, a, bias, v, 0.2, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_dropout_zero_rate_is_exact():
    mesh = make_mesh(4, model_parallel=4)
    rng = np.random.default_rng(4)
    p, q, a, bias, v = _case(rng, b=1, n=16, e=8, d=8)
    want = gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, bias)
    got = ring_gatv2_attention(
        p, q, a, bias, v, 0.2, mesh,
        dropout_rate=0.0, dropout_rng=jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_dropout_semantics():
    """Attention-weight dropout matches the reference placement — softmaxed
    weights masked/scaled WITHOUT renormalizing (``modules.py:89-90``).
    Verified exactly: reconstruct the per-tile bernoulli masks the ring
    generates (fold_in(key, query_block * S + key_block)) and compare against
    the dense computation with those masks applied post-softmax."""
    n_shards = 4
    mesh = make_mesh(n_shards, model_parallel=n_shards)
    rng = np.random.default_rng(5)
    b, n, rate = 1, 16, 0.3
    p, q, a, bias, v = _case(rng, b=b, n=n, e=8, d=4)
    key = jax.random.PRNGKey(42)

    got = ring_gatv2_attention(
        p, q, a, bias, v, 0.2, mesh, dropout_rate=rate, dropout_rng=key
    )

    # host-side reconstruction of the tile mask grid
    nl = n // n_shards
    mask = np.zeros((b, n, n), bool)
    for qb in range(n_shards):
        for kb in range(n_shards):
            tile_key = jax.random.fold_in(key, qb * n_shards + kb)
            keep = jax.random.bernoulli(tile_key, 1.0 - rate, (b, nl, nl))
            mask[:, qb * nl:(qb + 1) * nl, kb * nl:(kb + 1) * nl] = np.asarray(keep)

    scores = np.asarray(gatv2_scores_dense(p, q, a, 0.2)) + np.asarray(bias)
    att = np.exp(scores - scores.max(axis=2, keepdims=True))
    att = att / att.sum(axis=2, keepdims=True)
    att = np.where(mask, att / (1.0 - rate), 0.0)
    want = 1.0 / (1.0 + np.exp(-np.einsum("bij,bjd->bid", att, np.asarray(v))))

    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)
    # and dropout actually perturbs the deterministic output
    det = ring_gatv2_attention(p, q, a, bias, v, 0.2, mesh)
    assert not np.allclose(np.asarray(got), np.asarray(det), atol=1e-6)


def test_model_ring_impl_matches_dense():
    """attention_impl='ring' through the full MTADGAT forward equals
    attention_impl='dense' under a model-parallel mesh."""
    from mtad_gat_tpu.config import MTADGATConfig
    from mtad_gat_tpu.models import MTADGAT
    from mtad_gat_tpu.parallel.sharding import use_mesh

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 1, (4, 24, 10)), jnp.float32)

    def build(impl):
        cfg = MTADGATConfig(
            n_features=10, window_size=24, out_dim=10, kernel_size=7,
            gru_hid_dim=16, forecast_hid_dim=16, forecast_n_layers=1,
            recon_hid_dim=16, recon_n_layers=1, dropout=0.0,
            attention_impl=impl,
        )
        return MTADGAT(cfg)

    dense = build("dense")
    params = dense.init(jax.random.PRNGKey(0), x, deterministic=True)["params"]
    want = dense.apply({"params": params}, x, deterministic=True)

    mesh = make_mesh(8, model_parallel=4)
    ring = build("ring")
    with use_mesh(mesh):
        got = jax.jit(
            lambda p, x: ring.apply({"params": p}, x, deterministic=True)
        )(params, x)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=3e-5)


def test_trainer_ring_step_matches_dense_losses():
    """One full train step (grads + adam) through the ring path produces the
    same losses as the dense path on the 8-device farm."""
    from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
    from mtad_gat_tpu.data.windows import batched_starts
    from mtad_gat_tpu.training import Trainer

    rng = np.random.default_rng(7)
    series = jnp.asarray(rng.standard_normal((80, 8)), jnp.float32)
    mesh = make_mesh(8, model_parallel=4)

    def one_epoch(impl, mesh_arg):
        cfg = MTADGATConfig(
            n_features=8, window_size=16, out_dim=8, kernel_size=7,
            gru_hid_dim=16, forecast_hid_dim=16, forecast_n_layers=1,
            recon_hid_dim=16, recon_n_layers=1, dropout=0.0,
            attention_impl=impl,
        )
        tcfg = TrainConfig(epochs=1, val_split=0.0, bs=8, init_lr=1e-3,
                           log_tensorboard=False, seed=0)
        tr = Trainer(cfg, tcfg, save_path="", log_dir="/tmp/ring_logs",
                     mesh=mesh_arg)
        state = tr.init_state()
        starts, mask, _ = batched_starts(16, 8)
        state, (f, r) = tr._epoch_train(state, series, starts, mask)
        return np.asarray(f), np.asarray(r)

    f_dense, r_dense = one_epoch("dense", None)
    f_ring, r_ring = one_epoch("ring", mesh)
    np.testing.assert_allclose(f_ring, f_dense, atol=1e-5)
    np.testing.assert_allclose(r_ring, r_dense, atol=1e-5)


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
