"""Predictor tests: the single-pass scoring trick must equal the reference's
two-forward-pass formulation, and predict_anomalies must produce the full
output surface (summary + dataframes)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.inference import Predictor
from mtad_gat_tpu.models import MTADGAT

K, W = 5, 12


@pytest.fixture(scope="module")
def model_and_params():
    cfg = MTADGATConfig(
        n_features=K, window_size=W, out_dim=K, gru_hid_dim=16,
        forecast_hid_dim=16, forecast_n_layers=1, recon_hid_dim=16,
        recon_n_layers=1, dropout=0.0,
    )
    model = MTADGAT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, W, K)))["params"]
    return model, params


def _pred_args(save_path, target_dims=None):
    return {
        "dataset": "SMD", "target_dims": target_dims, "scale_scores": False,
        "q": 1e-3, "level": 0.98, "dynamic_pot": False, "use_mov_av": False,
        "gamma": 1.0, "reg_level": 1, "save_path": str(save_path),
    }


def test_single_pass_equals_reference_formulation(model_and_params, tmp_path):
    """Reference get_score (prediction.py:51-63): forecast = model(x)[0];
    recon = model(cat(x[:,1:,:], y))[1][:, -1]. Our single pass must match."""
    model, params = model_and_params
    train, test, _ = synthetic_series(n_train=100, n_test=80, n_features=K)
    predictor = Predictor(model, params, W, K, _pred_args(tmp_path), batch_size=16)
    df = predictor.get_score(test)

    # naive reference-style computation
    T = test.shape[0]
    n = T - W
    x = np.stack([test[i : i + W] for i in range(n)])
    y = np.stack([test[i + W : i + W + 1] for i in range(n)])
    preds_ref, _ = model.apply({"params": params}, jnp.asarray(x), deterministic=True)
    recon_x = np.concatenate([x[:, 1:, :], y], axis=1)
    _, recons_ref = model.apply({"params": params}, jnp.asarray(recon_x), deterministic=True)
    recons_ref = np.asarray(recons_ref)[:, -1, :]

    for i in range(K):
        np.testing.assert_allclose(
            df[f"Forecast_{i}"].values, np.asarray(preds_ref)[:, i], atol=1e-5
        )
        np.testing.assert_allclose(
            df[f"Recon_{i}"].values, recons_ref[:, i], atol=1e-5
        )
        np.testing.assert_allclose(df[f"True_{i}"].values, test[W:, i], atol=1e-6)


def test_predict_anomalies_outputs(model_and_params, tmp_path):
    model, params = model_and_params
    train, test, labels = synthetic_series(n_train=150, n_test=120, n_features=K)
    predictor = Predictor(model, params, W, K, _pred_args(tmp_path), batch_size=16)
    label_w = labels[W:]
    summary = predictor.predict_anomalies(train, test, label_w)

    assert set(summary) == {"epsilon_result", "pot_result", "bf_result"}
    for key in ("f1", "precision", "recall", "threshold"):
        assert key in summary["epsilon_result"]
        assert key in summary["pot_result"]
        assert key in summary["bf_result"]

    with open(os.path.join(tmp_path, "summary.txt")) as f:
        on_disk = json.load(f)
    assert on_disk == summary

    import pandas as pd

    test_df = pd.read_pickle(os.path.join(tmp_path, "test_output.pkl"))
    for col in ("A_Score_Global", "A_Pred_Global", "Thresh_Global", "A_True_Global"):
        assert col in test_df.columns
    for i in range(K):
        for prefix in ("Forecast", "Recon", "True", "A_Score", "A_Pred", "Thresh"):
            assert f"{prefix}_{i}" in test_df.columns

    # load_scores path reuses the pickles
    summary2 = predictor.predict_anomalies(
        train, test, label_w, load_scores=True, save_output=False
    )
    assert summary2["epsilon_result"]["f1"] == pytest.approx(
        summary["epsilon_result"]["f1"]
    )


def test_smoothing_span_invariant_to_batch_size(model_and_params, tmp_path):
    """Regression for the --bs fidelity bug: the reference Predictor hardcodes
    batch_size=256 (prediction.py:31) and its EWM span is
    int(256 * window * 0.05) (prediction.py:133) — a non-default scoring batch
    must NOT change smoothed scores."""
    import pandas as pd

    model, params = model_and_params
    rng = np.random.default_rng(7)
    scores = rng.random(500).astype(np.float64)

    p128 = Predictor(model, params, W, K, _pred_args(tmp_path), batch_size=128)
    p256 = Predictor(model, params, W, K, _pred_args(tmp_path), batch_size=256)
    s128 = p128._smooth(scores)
    s256 = p256._smooth(scores)
    np.testing.assert_array_equal(s128, s256)

    # and both equal the reference formula exactly
    span_ref = int(256 * W * 0.05)
    expected = pd.Series(scores).ewm(span=span_ref).mean().to_numpy()
    np.testing.assert_array_equal(s128, expected)


def test_target_dims_scoring(model_and_params, tmp_path):
    cfg = MTADGATConfig(
        n_features=K, window_size=W, out_dim=1, gru_hid_dim=16,
        forecast_hid_dim=16, forecast_n_layers=1, recon_hid_dim=16,
        recon_n_layers=1, dropout=0.0,
    )
    model = MTADGAT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, W, K)))["params"]
    train, test, labels = synthetic_series(n_train=120, n_test=100, n_features=K)
    predictor = Predictor(
        model, params, W, K, _pred_args(tmp_path, target_dims=[0]), batch_size=16
    )
    df = predictor.get_score(test)
    assert "Forecast_0" in df.columns
    assert "Forecast_1" not in df.columns
    np.testing.assert_allclose(df["True_0"].values, test[W:, 0], atol=1e-6)


def test_mesh_scoring_matches_single_device(model_and_params, tmp_path):
    """Mesh-aware scoring (VERDICT r3 item #2): get_score under the 8-device
    farm mesh must be column-exact vs the single-device run — the scoring
    scan shards over the data/model axes like the train step."""
    from mtad_gat_tpu.parallel import make_mesh

    model, params = model_and_params
    series, _, _ = synthetic_series(300, 50, K, seed=3)

    p_single = Predictor(model, params, W, K, _pred_args(tmp_path), batch_size=16)
    df_single = p_single.get_score(series)

    mesh = make_mesh(8)
    p_mesh = Predictor(
        model, params, W, K, _pred_args(tmp_path), batch_size=16, mesh=mesh
    )
    df_mesh = p_mesh.get_score(series)

    assert list(df_single.columns) == list(df_mesh.columns)
    for col in df_single.columns:
        np.testing.assert_allclose(
            df_mesh[col].to_numpy(), df_single[col].to_numpy(),
            atol=1e-5, err_msg=col,
        )
