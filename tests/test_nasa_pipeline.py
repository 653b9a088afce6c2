"""MSL/SMAP-shaped pipeline: NASA preprocessing (channel concat + label
vector from anomaly ranges), boundary score adjustment, and a short
target-dims training run."""

import os

import numpy as np
import pytest

from mtad_gat_tpu.data import adjust_anomaly_scores, get_data
from mtad_gat_tpu.data.preprocess import preprocess


@pytest.fixture()
def msl_like_root(tmp_path):
    """Two fake MSL channels with .npy train/test and labeled_anomalies.csv.
    Uses 55 features to match the MSL data-dim table."""
    root = tmp_path
    base = root / "data"
    for cat in ("train", "test"):
        os.makedirs(base / cat)
    rng = np.random.default_rng(0)
    chans = ["M-1", "M-2"]
    lengths = {"M-1": 120, "M-2": 140}
    for c in chans:
        np.save(base / "train" / f"{c}.npy", rng.random((100, 55)).astype(np.float32))
        np.save(base / "test" / f"{c}.npy", rng.random((lengths[c], 55)).astype(np.float32))
    # anomaly ranges within each channel's test split
    with open(base / "labeled_anomalies.csv", "w") as f:
        f.write("chan_id,spacecraft,anomaly_sequences,class,num_values\n")
        f.write('M-1,MSL,"[[40, 60]]",[point],120\n')
        f.write('M-2,MSL,"[[10, 30]]",[point],140\n')
    # train metadata for adjust_anomaly_scores
    with open(base / "msl_train_md.csv", "w") as f:
        f.write("chan_id,num_values\n")
        f.write("M-1,100\n")
        f.write("M-2,100\n")
    return root


def test_preprocess_and_load(msl_like_root):
    preprocess("MSL", data_root=str(msl_like_root))
    (x_train, _), (x_test, y_test) = get_data(
        "MSL", data_root=str(msl_like_root), normalize=True
    )
    assert x_train.shape == (200, 55)      # 2 channels x 100 concatenated
    assert x_test.shape == (260, 55)       # 120 + 140
    assert y_test.shape == (260,)
    # label vector from ranges: [40,60] and 120+[10,30] inclusive
    assert y_test[40] and y_test[60] and not y_test[61]
    assert y_test[130] and y_test[150] and not y_test[151]
    assert y_test.sum() == 21 + 21


def test_adjust_anomaly_scores_boundaries(msl_like_root):
    lookback = 10
    scores = np.ones(260 - lookback)
    scores[5] = 3.0  # some variation so min-max isn't degenerate
    adjusted = adjust_anomaly_scores(
        scores.copy(), "MSL", is_train=False, lookback=lookback,
        data_root=str(msl_like_root),
    )
    # channel boundary at cumsum(num_values) - lookback = 120 - 10 = 110;
    # +/-19 window zeroed
    boundary = 110
    assert (adjusted[boundary - 19 : boundary + 20] == 0).all()
    # segments min-max normalized into [0, 1]
    assert adjusted.max() <= 1.0 + 1e-9
    assert adjusted.min() >= 0.0


def test_train_msl_like(msl_like_root, tmp_path):
    from mtad_gat_tpu.cli.train_cli import run_training
    from mtad_gat_tpu.config import RunConfig

    preprocess("MSL", data_root=str(msl_like_root))
    cfg = RunConfig(
        dataset="MSL", lookback=15, epochs=1, bs=16, gru_hid_dim=12,
        fc_hid_dim=12, fc_n_layers=1, recon_hid_dim=12,
        log_tensorboard=False, data_root=str(msl_like_root),
        output_root=str(tmp_path / "output"),
    )
    save_path = run_training(cfg, run_id="01012026_130000")
    assert os.path.exists(os.path.join(save_path, "summary.txt"))
