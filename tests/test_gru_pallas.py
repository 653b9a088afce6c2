"""Fused Pallas GRU scan vs the lax.scan oracle: forward sequence, last
hidden, the full BPTT backward (dgi, dW_hh, db_hh), and the model-level
``gru_impl="pallas"`` config path.

The kernel is reachable via ``MTADGATConfig(gru_impl="pallas")`` /
``--gru_impl pallas``; the default ``gru_impl="auto"`` selects it at
windows >= GRU_PALLAS_MIN_WINDOW where it wins the measured sweep
(+43% at lookback 8192, docs/PERFORMANCE.md), and the XLA scan at the
flagship window 100 where the two tie — the round-3 measurement: it ties the XLA
scan (0.90-0.96x — both are bounded by the serial step dependency, not by
loop overhead; docs/PERFORMANCE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.kernels.gru_pallas import gru_scan_fused


def _oracle(gi, w_hh, b_hh, H):
    def step(h, gi_t):
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        new = (1 - z) * n + z * h
        return new, new

    h0 = jnp.zeros((gi.shape[0], H), jnp.float32)
    last, outs = jax.lax.scan(step, h0, jnp.swapaxes(gi, 0, 1))
    return jnp.swapaxes(outs, 0, 1), last


def _case(rng, B, n, H):
    gi = jnp.asarray(rng.standard_normal((B, n, 3 * H)), jnp.float32)
    w_hh = jnp.asarray(0.2 * rng.standard_normal((H, 3 * H)), jnp.float32)
    b_hh = jnp.asarray(0.1 * rng.standard_normal(3 * H), jnp.float32)
    return gi, w_hh, b_hh


@pytest.mark.parametrize("B,n,H", [(5, 13, 150), (8, 100, 150), (3, 7, 32)])
def test_forward_matches_scan(B, n, H):
    rng = np.random.default_rng(0)
    gi, w_hh, b_hh = _case(rng, B, n, H)
    want_seq, want_last = _oracle(gi, w_hh, b_hh, H)
    got_seq, got_last = gru_scan_fused(gi, w_hh, b_hh, H)
    np.testing.assert_allclose(np.asarray(got_seq), np.asarray(want_seq), atol=3e-6)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last), atol=3e-6)


@pytest.mark.parametrize("B,n,H", [(5, 13, 150), (4, 21, 64)])
def test_backward_matches_scan(B, n, H):
    rng = np.random.default_rng(1)
    gi, w_hh, b_hh = _case(rng, B, n, H)

    def loss_f(gi, w, b):
        seq, last = gru_scan_fused(gi, w, b, H)
        return jnp.sum(seq ** 2) + jnp.sum(last * 0.3)

    def loss_o(gi, w, b):
        seq, last = _oracle(gi, w, b, H)
        return jnp.sum(seq ** 2) + jnp.sum(last * 0.3)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(gi, w_hh, b_hh)
    g2 = jax.grad(loss_o, argnums=(0, 1, 2))(gi, w_hh, b_hh)
    for name, a, b in zip(("dgi", "dw_hh", "db_hh"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=6e-5, rtol=2e-5, err_msg=name
        )


def test_jit_and_grad_under_jit():
    rng = np.random.default_rng(2)
    gi, w_hh, b_hh = _case(rng, 4, 10, 150)

    f = jax.jit(lambda gi, w, b: gru_scan_fused(gi, w, b, 150)[1])
    g = jax.jit(jax.grad(lambda gi, w, b: jnp.sum(f(gi, w, b)), argnums=1))
    last = f(gi, w_hh, b_hh)
    dw = g(gi, w_hh, b_hh)
    assert np.isfinite(np.asarray(last)).all()
    assert np.isfinite(np.asarray(dw)).all()


def test_model_gru_impl_pallas_matches_xla():
    """gru_impl='pallas' through the full model (encoder GRU + recon decoder
    GRU) must match the default XLA scan at identical params."""
    from mtad_gat_tpu.config import MTADGATConfig
    from mtad_gat_tpu.models import MTADGAT

    K, W = 5, 11
    kwargs = dict(
        n_features=K, window_size=W, out_dim=K, kernel_size=7,
        gru_hid_dim=24, forecast_hid_dim=16, forecast_n_layers=1,
        recon_hid_dim=24, recon_n_layers=1, dropout=0.0,
    )
    m_xla = MTADGAT(MTADGATConfig(**kwargs))
    m_pal = MTADGAT(MTADGATConfig(**kwargs, gru_impl="pallas"))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, W, K)),
                    jnp.float32)
    params = m_xla.init(jax.random.PRNGKey(0), x)["params"]
    # identical parameter trees: the impl choice is topology-free
    p2 = m_pal.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)

    want = m_xla.apply({"params": params}, x, deterministic=True)
    got = m_pal.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=2e-5)


def test_gru_impl_validation():
    from mtad_gat_tpu.config import MTADGATConfig

    with pytest.raises(ValueError, match="gru_impl"):
        MTADGATConfig(n_features=4, window_size=8, gru_impl="mosaic")


def test_gru_impl_auto_resolution():
    """gru_impl='auto' (the default) resolves by the measured regime:
    xla at the flagship window, pallas at >= GRU_PALLAS_MIN_WINDOW."""
    from mtad_gat_tpu.config import GRU_PALLAS_MIN_WINDOW, MTADGATConfig

    short = MTADGATConfig(n_features=4, window_size=100)
    assert short.gru_impl == "auto"
    assert short.resolved_gru_impl() == "xla"
    long = MTADGATConfig(
        n_features=4, window_size=GRU_PALLAS_MIN_WINDOW,
        temporal_graph="band:16", bias_storage="band",
    )
    assert long.resolved_gru_impl() == "pallas"
    # explicit settings are never overridden
    assert MTADGATConfig(
        n_features=4, window_size=8192, gru_impl="xla",
        temporal_graph="band:16", bias_storage="band",
    ).resolved_gru_impl() == "xla"
