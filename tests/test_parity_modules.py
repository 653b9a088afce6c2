"""Activation-allclose parity: each of our layers vs the reference torch
modules on identical weights and inputs (eval mode, dropout off).

Covers the idiosyncratic reference details called out in SURVEY.md §7:
GATv2 embed-dim doubling, learnable score bias, sigmoid output, GATv1 path,
conv zero-pre-pad + ReLU, GRU h[-1] semantics, MLP head layer count, and the
reconstruction decoder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from tests.conftest import requires_reference
from tests import torch_ref

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.models import MTADGAT
from mtad_gat_tpu.nn import (
    FeatureAttention,
    ForecastingHead,
    GRU,
    ReconstructionHead,
    TemporalAttention,
    TemporalConv,
)

B, N, K = 4, 20, 7  # batch, window, features (small for test speed)

torch.manual_seed(0)


def _x(b=B, n=N, k=K):
    rng = np.random.default_rng(42)
    return rng.standard_normal((b, n, k)).astype(np.float32)


@requires_reference
def test_conv_parity():
    m = torch_ref.ref_modules()
    for kernel_size in (7, 5, 4):
        t = m.ConvLayer(K, kernel_size).eval()
        x = _x()
        ours = TemporalConv(n_features=K, kernel_size=kernel_size)
        params = {"params": torch_ref.map_conv(t)}
        got = ours.apply(params, jnp.asarray(x))
        want = t(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("use_gatv2", [True, False])
@pytest.mark.parametrize("impl", ["dense", "sparse"])
@requires_reference
def test_feature_attention_parity(use_gatv2, impl):
    m = torch_ref.ref_modules()
    t = m.FeatureAttentionLayer(K, N, dropout=0.0, alpha=0.2, use_gatv2=use_gatv2).eval()
    x = _x()
    ours = FeatureAttention(
        n_features=K, window_size=N, dropout=0.0, alpha=0.2,
        use_gatv2=use_gatv2, impl=impl,
    )
    params = {"params": torch_ref.map_gat(t)}
    got = ours.apply(params, jnp.asarray(x))
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("use_gatv2", [True, False])
@pytest.mark.parametrize("impl", ["dense", "sparse"])
@requires_reference
def test_temporal_attention_parity(use_gatv2, impl):
    m = torch_ref.ref_modules()
    t = m.TemporalAttentionLayer(K, N, dropout=0.0, alpha=0.2, use_gatv2=use_gatv2).eval()
    x = _x()
    ours = TemporalAttention(
        n_features=K, window_size=N, dropout=0.0, alpha=0.2,
        use_gatv2=use_gatv2, impl=impl,
    )
    params = {"params": torch_ref.map_gat(t)}
    got = ours.apply(params, jnp.asarray(x))
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("n_layers", [1, 2])
@requires_reference
def test_gru_parity(n_layers):
    m = torch_ref.ref_modules()
    t = m.GRULayer(K, 16, n_layers, dropout=0.0).eval()
    x = _x(k=K)
    ours = GRU(in_dim=K, hid_dim=16, n_layers=n_layers, dropout=0.0)
    params = {"params": torch_ref.map_gru_params(t.gru, n_layers)}
    out_seq, h_last = ours.apply(params, jnp.asarray(x))
    with torch.no_grad():
        torch_out, torch_h = t.gru(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_seq), torch_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), torch_h[-1].numpy(), atol=1e-5)


@requires_reference
def test_forecast_head_parity():
    m = torch_ref.ref_modules()
    t = m.Forecasting_Model(in_dim=16, hid_dim=32, out_dim=K, n_layers=3, dropout=0.0).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, 16)).astype(np.float32)
    ours = ForecastingHead(in_dim=16, hid_dim=32, out_dim=K, n_layers=3, dropout=0.0)
    params = {"params": torch_ref.map_forecast(t)}
    got = ours.apply(params, jnp.asarray(x))
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # layer count semantics: n_layers=3 means 4 Linears (modules.py:297-301)
    assert len(t.layers) == 4


@requires_reference
def test_recon_head_parity():
    m = torch_ref.ref_modules()
    t = m.ReconstructionModel(
        window_size=N, in_dim=16, hid_dim=24, out_dim=K, n_layers=1, dropout=0.0
    ).eval()
    rng = np.random.default_rng(2)
    h_end = rng.standard_normal((B, 16)).astype(np.float32)
    ours = ReconstructionHead(
        window_size=N, in_dim=16, hid_dim=24, out_dim=K, n_layers=1, dropout=0.0
    )
    params = {"params": torch_ref.map_recon(t, 1)}
    got = ours.apply(params, jnp.asarray(h_end))
    want = t(torch.from_numpy(h_end)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("use_gatv2", [True, False])
@requires_reference
def test_full_model_parity(use_gatv2):
    mg = torch_ref.ref_model()
    t = mg.MTAD_GAT(
        n_features=K, window_size=N, out_dim=K, kernel_size=7,
        use_gatv2=use_gatv2, gru_n_layers=1, gru_hid_dim=16,
        forecast_n_layers=2, forecast_hid_dim=16, recon_n_layers=1,
        recon_hid_dim=16, dropout=0.0, alpha=0.2,
    ).eval()
    x = _x()
    cfg = MTADGATConfig(
        n_features=K, window_size=N, out_dim=K, kernel_size=7,
        use_gatv2=use_gatv2, gru_n_layers=1, gru_hid_dim=16,
        forecast_n_layers=2, forecast_hid_dim=16, recon_n_layers=1,
        recon_hid_dim=16, dropout=0.0, alpha=0.2,
    )
    ours = MTADGAT(cfg)
    params = {"params": torch_ref.map_full_model(t, 1, 1)}
    preds, recons = ours.apply(params, jnp.asarray(x))
    with torch.no_grad():
        tp, tr = t(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(preds), tp.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(recons), tr.numpy(), atol=3e-5)


def test_sparse_equals_dense_no_reference():
    """Sparse COO path must reduce to the dense result on complete graphs
    (SURVEY.md §7 invariant) — runs without the reference."""
    cfg = dict(n_features=K, window_size=N, dropout=0.0, alpha=0.2, use_gatv2=True)
    x = jnp.asarray(_x())
    dense = FeatureAttention(impl="dense", **cfg)
    sparse = FeatureAttention(impl="sparse", **cfg)
    params = dense.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(dense.apply(params, x)),
        np.asarray(sparse.apply(params, x)),
        atol=1e-5,
    )
