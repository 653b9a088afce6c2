"""Quality parity from OUR forward pass with the reference's TRAINED weights.

The reference commits three trained checkpoints (``output/MSL/27062021_111641/
model.pt``, ``output/SMD/1-1/27062021_114402/model.pt``,
``output/SMAP/27062021_112545/model.pt``) plus, for MSL, the full score
DataFrames (``train_output.pkl``/``test_output.pkl``). The raw NASA/SMD series
are NOT committed, so the strongest provable chain is:

1. import each trained ``model.pt`` into our flax tree
   (``utils/torch_import.py``) and show OUR forward pass matches the torch
   reference forward with those weights (activation parity at trained — not
   just random-init — weights, all three datasets);
2. show OUR ``Predictor.get_score`` produces the reference Predictor's exact
   DataFrame on the same series and weights (cross-implementation end-to-end,
   reference ``prediction.py:36-94``);
3. on the real MSL data that IS recoverable — the committed Forecast/Recon/True
   columns — rerun our score formula, channel adjustment, and all three
   thresholding methods and reproduce the committed ``A_Score_0``,
   ``A_Score_Global`` columns and every BASELINE.md MSL F1/P/R row.

(1) + (2) prove forward/scoring equivalence; (3) proves the host-side quality
chain on real data. Together they close the loop the raw data's absence leaves.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.torch_ref import ref_model

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.data.loading import adjust_anomaly_scores
from mtad_gat_tpu.inference import bf_search, epsilon_eval, pot_eval
from mtad_gat_tpu.models import MTADGAT
from mtad_gat_tpu.utils.torch_import import (
    infer_model_dims,
    load_torch_checkpoint,
    torch_state_dict_to_params,
)

REF_OUT = "/root/reference/output"
RUNS = {
    # dataset: (run_dir, n_features, out_dim)
    "MSL": (f"{REF_OUT}/MSL/27062021_111641", 55, 1),
    "SMD": (f"{REF_OUT}/SMD/1-1/27062021_114402", 38, 38),
    "SMAP": (f"{REF_OUT}/SMAP/27062021_112545", 25, 1),
}

pytestmark = [
    requires_reference,
    pytest.mark.skipif(
        not os.path.isdir(REF_OUT), reason="reference committed runs not present"
    ),
]


def _run_config(run_dir):
    with open(os.path.join(run_dir, "config.txt")) as f:
        return json.load(f)


def _build_ours(cfg, n_features, out_dim):
    return MTADGAT(
        MTADGATConfig(
            n_features=n_features,
            window_size=cfg["lookback"],
            out_dim=out_dim,
            kernel_size=cfg["kernel_size"],
            use_gatv2=cfg["use_gatv2"],
            feat_gat_embed_dim=cfg["feat_gat_embed_dim"],
            time_gat_embed_dim=cfg["time_gat_embed_dim"],
            gru_n_layers=cfg["gru_n_layers"],
            gru_hid_dim=cfg["gru_hid_dim"],
            forecast_n_layers=cfg["fc_n_layers"],
            forecast_hid_dim=cfg["fc_hid_dim"],
            recon_n_layers=cfg["recon_n_layers"],
            recon_hid_dim=cfg["recon_hid_dim"],
            dropout=cfg["dropout"],
            alpha=cfg["alpha"],
        )
    )


def _build_torch(cfg, n_features, out_dim, state_dict):
    import torch

    m = ref_model().MTAD_GAT(
        n_features,
        cfg["lookback"],
        out_dim,
        kernel_size=cfg["kernel_size"],
        use_gatv2=cfg["use_gatv2"],
        feat_gat_embed_dim=cfg["feat_gat_embed_dim"],
        time_gat_embed_dim=cfg["time_gat_embed_dim"],
        gru_n_layers=cfg["gru_n_layers"],
        gru_hid_dim=cfg["gru_hid_dim"],
        forecast_n_layers=cfg["fc_n_layers"],
        forecast_hid_dim=cfg["fc_hid_dim"],
        recon_n_layers=cfg["recon_n_layers"],
        recon_hid_dim=cfg["recon_hid_dim"],
        dropout=cfg["dropout"],
        alpha=cfg["alpha"],
    )
    m.load_state_dict(state_dict)
    m.eval()
    return m


@pytest.mark.parametrize("dataset", list(RUNS))
def test_inferred_dims_match_config(dataset):
    import torch

    run_dir, n_features, out_dim = RUNS[dataset]
    sd = torch.load(os.path.join(run_dir, "model.pt"), map_location="cpu")
    cfg = _run_config(run_dir)
    dims = infer_model_dims(sd)
    assert dims["n_features"] == n_features
    assert dims["out_dim"] == out_dim
    assert dims["window_size"] == cfg["lookback"]
    assert dims["kernel_size"] == cfg["kernel_size"]
    assert dims["gru_hid_dim"] == cfg["gru_hid_dim"]
    assert dims["gru_n_layers"] == cfg["gru_n_layers"]
    assert dims["recon_n_layers"] == cfg["recon_n_layers"]
    assert dims["fc_n_layers"] == cfg["fc_n_layers"]


@pytest.mark.parametrize("dataset", list(RUNS))
def test_forward_parity_at_trained_weights(dataset, rng):
    """Our forward with imported weights == torch forward with the committed
    trained checkpoint (reference ``mtad_gat.py:64-79``)."""
    import torch

    run_dir, n_features, out_dim = RUNS[dataset]
    cfg = _run_config(run_dir)
    sd = torch.load(os.path.join(run_dir, "model.pt"), map_location="cpu")

    x = rng.uniform(0.0, 1.0, size=(4, cfg["lookback"], n_features)).astype(np.float32)

    tm = _build_torch(cfg, n_features, out_dim, sd)
    with torch.no_grad():
        t_preds, t_recons = tm(torch.from_numpy(x))

    ours = _build_ours(cfg, n_features, out_dim)
    params = torch_state_dict_to_params(sd)
    j_preds, j_recons = ours.apply({"params": params}, x, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(j_preds), t_preds.numpy(), rtol=1e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_recons), t_recons.numpy(), rtol=1e-5, atol=2e-5
    )


def test_get_score_cross_implementation_msl(rng):
    """Our single-pass Predictor.get_score reproduces the reference
    Predictor's full DataFrame with the trained MSL weights on the same
    series (reference ``prediction.py:36-94``)."""
    import pandas as pd
    import torch

    run_dir, n_features, out_dim = RUNS["MSL"]
    cfg = _run_config(run_dir)
    sd = torch.load(os.path.join(run_dir, "model.pt"), map_location="cpu")
    w = cfg["lookback"]
    series = rng.uniform(0.0, 1.0, size=(w + 37, n_features)).astype(np.float32)

    from tests.torch_ref import load_ref

    ref_prediction = load_ref("prediction")

    pred_args = {
        "dataset": "MSL",
        "target_dims": [0],
        "scale_scores": False,
        "q": 1e-3,
        "level": 0.9,
        "dynamic_pot": False,
        "use_mov_av": False,
        "gamma": 1.0,
        "reg_level": 0,
        "save_path": "/tmp/unused",
    }
    tm = _build_torch(cfg, n_features, out_dim, sd)
    ref_pred = ref_prediction.Predictor(tm, w, n_features, dict(pred_args))
    ref_pred.use_cuda = False
    ref_df = ref_pred.get_score(torch.from_numpy(series))

    from mtad_gat_tpu.inference.predictor import Predictor

    ours_model = _build_ours(cfg, n_features, out_dim)
    params = torch_state_dict_to_params(sd)
    our_pred = Predictor(
        ours_model, params, w, n_features, {**pred_args, "save_path": "/tmp/unused2"}
    )
    our_df = our_pred.get_score(series)

    assert list(our_df.columns) == list(ref_df.columns)
    for col in ref_df.columns:
        np.testing.assert_allclose(
            our_df[col].values, ref_df[col].values, rtol=1e-4, atol=2e-5,
            err_msg=f"column {col}",
        )


def test_get_score_cross_implementation_smd(rng):
    """Same cross-implementation check at SMD's trained weights — out_dim=38
    (all features forecast/reconstructed), exercising the full multi-feature
    column structure of the DataFrame."""
    import torch

    run_dir, n_features, out_dim = RUNS["SMD"]
    cfg = _run_config(run_dir)
    sd = torch.load(os.path.join(run_dir, "model.pt"), map_location="cpu")
    w = cfg["lookback"]
    series = rng.uniform(0.0, 1.0, size=(w + 21, n_features)).astype(np.float32)

    from tests.torch_ref import load_ref

    ref_prediction = load_ref("prediction")

    pred_args = {
        "dataset": "SMD", "target_dims": None, "scale_scores": False,
        "q": 1e-3, "level": 0.995, "dynamic_pot": False, "use_mov_av": False,
        "gamma": 1.0, "reg_level": 1, "save_path": "/tmp/unused",
    }
    tm = _build_torch(cfg, n_features, out_dim, sd)
    ref_pred = ref_prediction.Predictor(tm, w, n_features, dict(pred_args))
    ref_pred.use_cuda = False
    ref_df = ref_pred.get_score(torch.from_numpy(series))

    from mtad_gat_tpu.inference.predictor import Predictor

    our_pred = Predictor(
        _build_ours(cfg, n_features, out_dim),
        torch_state_dict_to_params(sd), w, n_features,
        {**pred_args, "save_path": "/tmp/unused2"},
    )
    our_df = our_pred.get_score(series)

    assert list(our_df.columns) == list(ref_df.columns)
    assert sum(c.startswith("A_Score_") for c in our_df.columns) == out_dim + 1
    for col in ref_df.columns:
        np.testing.assert_allclose(
            our_df[col].values, ref_df[col].values, rtol=1e-4, atol=2e-5,
            err_msg=f"column {col}",
        )


def test_get_score_cross_implementation_smap(rng):
    """Same cross-implementation check at SMAP's trained weights (the third
    and last committed reference run): out_dim=1 target slicing at 25 input
    features, SMAP's POT table entries (level 0.90 / q 0.005 / reg 0)."""
    import torch

    run_dir, n_features, out_dim = RUNS["SMAP"]
    cfg = _run_config(run_dir)
    sd = torch.load(os.path.join(run_dir, "model.pt"), map_location="cpu")
    w = cfg["lookback"]
    series = rng.uniform(0.0, 1.0, size=(w + 29, n_features)).astype(np.float32)

    from tests.torch_ref import load_ref

    ref_prediction = load_ref("prediction")

    pred_args = {
        "dataset": "SMAP", "target_dims": [0], "scale_scores": False,
        "q": 0.005, "level": 0.90, "dynamic_pot": False, "use_mov_av": False,
        "gamma": 1.0, "reg_level": 0, "save_path": "/tmp/unused",
    }
    tm = _build_torch(cfg, n_features, out_dim, sd)
    ref_pred = ref_prediction.Predictor(tm, w, n_features, dict(pred_args))
    ref_pred.use_cuda = False
    ref_df = ref_pred.get_score(torch.from_numpy(series))

    from mtad_gat_tpu.inference.predictor import Predictor

    our_pred = Predictor(
        _build_ours(cfg, n_features, out_dim),
        torch_state_dict_to_params(sd), w, n_features,
        {**pred_args, "save_path": "/tmp/unused2"},
    )
    our_df = our_pred.get_score(series)

    assert list(our_df.columns) == list(ref_df.columns)
    for col in ref_df.columns:
        np.testing.assert_allclose(
            our_df[col].values, ref_df[col].values, rtol=1e-4, atol=2e-5,
            err_msg=f"column {col}",
        )


def test_export_roundtrip_and_reference_loads_our_weights(tmp_path, rng):
    """Two-way migration: params -> torch state_dict is the exact inverse of
    the import, and a model trained HERE loads into the reference torch
    implementation with matching forward outputs."""
    import torch

    from mtad_gat_tpu.utils.torch_import import (
        params_to_torch_state_dict,
        save_torch_checkpoint,
    )

    run_dir, n_features, out_dim = RUNS["SMAP"]
    cfg = _run_config(run_dir)
    sd = torch.load(os.path.join(run_dir, "model.pt"), map_location="cpu")

    # exact round-trip through our tree and back
    params = torch_state_dict_to_params(sd)
    sd_back = params_to_torch_state_dict(params)
    assert set(sd_back) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(sd_back[k], sd[k].numpy())

    # export a FRESH flax init and load it into the reference torch model
    ours = _build_ours(cfg, n_features, out_dim)
    x = rng.uniform(0, 1, (3, cfg["lookback"], n_features)).astype(np.float32)
    fresh = ours.init(jax.random.PRNGKey(7), x, deterministic=True)["params"]
    ckpt = tmp_path / "exported.pt"
    save_torch_checkpoint(fresh, str(ckpt))

    tm = _build_torch(cfg, n_features, out_dim, torch.load(str(ckpt)))
    with torch.no_grad():
        t_preds, t_recons = tm(torch.from_numpy(x))
    j_preds, j_recons = ours.apply({"params": fresh}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(j_preds), t_preds.numpy(),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_recons), t_recons.numpy(),
                               rtol=1e-5, atol=2e-5)


def test_trainer_load_torch_roundtrip():
    """Trainer.load_torch imports a committed checkpoint and rejects an
    architecture mismatch loudly."""
    from mtad_gat_tpu.config import TrainConfig
    from mtad_gat_tpu.training import Trainer

    run_dir, n_features, out_dim = RUNS["SMD"]
    cfg = _run_config(run_dir)
    model_cfg = _build_ours(cfg, n_features, out_dim).config
    tr = Trainer(model_cfg, TrainConfig(epochs=1, log_tensorboard=False))
    tr.load_torch(os.path.join(run_dir, "model.pt"))
    # imported params drive a working forward pass
    x = np.zeros((2, cfg["lookback"], n_features), np.float32)
    preds, recons = tr.model.apply({"params": tr.state.params}, x, deterministic=True)
    assert preds.shape == (2, out_dim) and recons.shape == (2, cfg["lookback"], out_dim)

    # wrong architecture -> loud failure
    bad_cfg = MTADGATConfig(
        n_features=n_features, window_size=cfg["lookback"], out_dim=out_dim,
        gru_hid_dim=64,
    )
    tr_bad = Trainer(bad_cfg, TrainConfig(epochs=1, log_tensorboard=False))
    with pytest.raises(ValueError, match="does not match"):
        tr_bad.load_torch(os.path.join(run_dir, "model.pt"))


def test_predict_cli_torch_ckpt_end_to_end(tmp_path, monkeypatch):
    """predict.py --torch_ckpt drives the whole pipeline from a torch
    state_dict: train a tiny run for the run-dir/config, then predict with a
    reference-architecture torch checkpoint instead of the msgpack."""
    import pickle

    import torch

    from mtad_gat_tpu.cli import predict_cli
    from mtad_gat_tpu.cli.train_cli import run_training
    from mtad_gat_tpu.config import RunConfig

    rng = np.random.default_rng(0)
    d = tmp_path / "ServerMachineDataset" / "processed"
    d.mkdir(parents=True)
    series = rng.standard_normal((200, 38)).astype(np.float32)
    label = np.zeros(80, np.float32)
    label[30:40] = 1
    for name, arr in [
        ("machine-1-1_train", series),
        ("machine-1-1_test", series[:80]),
        ("machine-1-1_test_label", label),
    ]:
        with open(d / f"{name}.pkl", "wb") as f:
            pickle.dump(arr, f)

    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=16, epochs=1, bs=8,
        val_split=0.0, log_tensorboard=False, gru_hid_dim=16,
        fc_n_layers=1, fc_hid_dim=16, recon_n_layers=1, recon_hid_dim=16,
        dropout=0.0, data_root=str(tmp_path), output_root=str(tmp_path / "out"),
    )
    run_dir = run_training(cfg, run_id="ckptrun")

    tm = ref_model().MTAD_GAT(
        38, 16, 38, kernel_size=7, use_gatv2=True, gru_n_layers=1,
        gru_hid_dim=16, forecast_n_layers=1, forecast_hid_dim=16,
        recon_n_layers=1, recon_hid_dim=16, dropout=0.0, alpha=0.2,
    )
    ckpt = tmp_path / "ref_model.pt"
    torch.save(tm.state_dict(), ckpt)

    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--dataset", "SMD", "--group", "1-1",
        "--model_id", "ckptrun", "--torch_ckpt", str(ckpt),
        "--data_root", str(tmp_path), "--output_root", str(tmp_path / "out"),
    ])
    predict_cli.main()
    # numbered summary written next to the training one, from torch weights
    assert os.path.exists(os.path.join(run_dir, "summary_1.txt"))
    with open(os.path.join(run_dir, "summary_1.txt")) as f:
        summary = json.load(f)
    assert np.isfinite(summary["bf_result"]["f1"])


@pytest.fixture(scope="module")
def msl_golden():
    import pandas as pd

    run_dir = RUNS["MSL"][0]
    train_df = pd.read_pickle(os.path.join(run_dir, "train_output.pkl"))
    test_df = pd.read_pickle(os.path.join(run_dir, "test_output.pkl"))
    with open(os.path.join(run_dir, "summary.txt")) as f:
        summary = json.load(f)
    return train_df, test_df, summary


def _recompute_adjusted_global(df, is_train):
    """Score formula (gamma=1, no scaling — the committed run's config) +
    our channel adjustment, from the real MSL Forecast/Recon/True columns."""
    f = df["Forecast_0"].values
    r = df["Recon_0"].values
    t = df["True_0"].values
    a_score = np.sqrt((f - t) ** 2) + 1.0 * np.sqrt((r - t) ** 2)
    # out_dim == 1 for MSL, so the feature mean IS the global score
    return a_score, adjust_anomaly_scores(
        a_score.copy(), "MSL", is_train, 100, data_root="/root/reference/datasets"
    )


def test_msl_per_feature_scores_reproduced(msl_golden):
    train_df, test_df, _ = msl_golden
    for df in (train_df, test_df):
        a_score, _ = _recompute_adjusted_global(df, df is train_df)
        np.testing.assert_allclose(
            a_score, df["A_Score_0"].values, rtol=1e-6, atol=1e-7
        )


def test_msl_adjusted_global_scores_reproduced(msl_golden):
    """Our adjust_anomaly_scores on real MSL data reproduces the committed
    (post-adjustment) A_Score_Global column (reference ``utils.py:210-254``)."""
    train_df, test_df, _ = msl_golden
    for df, is_train in ((train_df, True), (test_df, False)):
        _, adjusted = _recompute_adjusted_global(df, is_train)
        np.testing.assert_allclose(
            adjusted, df["A_Score_Global"].values, rtol=1e-6, atol=1e-9
        )


def test_msl_baseline_f1s_from_recomputed_scores(msl_golden):
    """Full chain on real data: Forecast/Recon columns -> our score formula ->
    our channel adjustment -> our epsilon/POT/bf evaluation == every MSL row
    of BASELINE.md."""
    train_df, test_df, summary = msl_golden
    _, train_s = _recompute_adjusted_global(train_df, True)
    _, test_s = _recompute_adjusted_global(test_df, False)
    labels = test_df["A_True_Global"].values

    e = epsilon_eval(train_s, test_s, labels, reg_level=0)
    p = pot_eval(train_s, test_s, labels, q=0.001, level=0.90, dynamic=False)
    b = bf_search(test_s, labels, start=0.01, end=2, step_num=100, verbose=False)

    for ours, want in (
        (e, summary["epsilon_result"]),
        (p, summary["pot_result"]),
        (b, summary["bf_result"]),
    ):
        assert ours["f1"] == pytest.approx(want["f1"], abs=1e-6)
        assert ours["precision"] == pytest.approx(want["precision"], abs=1e-6)
        assert ours["recall"] == pytest.approx(want["recall"], abs=1e-6)
