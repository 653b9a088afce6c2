"""Sweep tooling test: two tiny synthetic SMD entities end to end with
aggregation."""

import json
import os
import pickle

import numpy as np

from mtad_gat_tpu.cli.sweep_cli import aggregate, discover_smd_entities, run_sweep
from mtad_gat_tpu.config import RunConfig
from mtad_gat_tpu.data import synthetic_series


def test_sweep_two_entities(tmp_path):
    root = tmp_path / "datasets"
    proc = root / "ServerMachineDataset" / "processed"
    os.makedirs(proc)
    for i, group in enumerate(["1-1", "1-2"]):
        train, test, labels = synthetic_series(
            n_train=300, n_test=200, n_features=38, seed=i
        )
        for suffix, arr in [("train", train), ("test", test),
                            ("test_label", labels.astype(np.float32))]:
            with open(proc / f"machine-{group}_{suffix}.pkl", "wb") as f:
                pickle.dump(arr, f)

    assert discover_smd_entities(str(root)) == ["1-1", "1-2"]

    cfg = RunConfig(
        dataset="SMD", lookback=20, epochs=1, bs=32, gru_hid_dim=16,
        fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(root),
        output_root=str(tmp_path / "output"),
    )
    results = run_sweep(cfg)
    assert set(results) == {"1-1", "1-2"}

    with open(tmp_path / "output" / "SMD" / "sweep_summary.json") as f:
        sweep = json.load(f)
    assert sweep["aggregate"]["bf_result"]["n_entities"] == 2
    assert 0.0 <= sweep["aggregate"]["bf_result"]["micro_f1"] <= 1.0


def test_aggregate_micro():
    results = {
        "a": {"bf_result": {"f1": 1.0, "TP": 10, "FP": 0, "FN": 0}},
        "b": {"bf_result": {"f1": 0.0, "TP": 0, "FP": 5, "FN": 5}},
    }
    agg = aggregate(results)
    assert agg["bf_result"]["mean_f1"] == 0.5
    assert agg["bf_result"]["micro_precision"] < 1.0


def test_sweep_batched_two_entities(tmp_path):
    """--batched sweep: both entities trained in ONE vmapped step, same
    output surface as the sequential sweep (run dirs, summaries, aggregate),
    and ragged entity lengths handled."""
    from mtad_gat_tpu.cli.sweep_cli import run_sweep_batched

    root = tmp_path / "datasets"
    proc = root / "ServerMachineDataset" / "processed"
    os.makedirs(proc)
    for i, (group, n_train) in enumerate([("1-1", 300), ("1-2", 260)]):
        train, test, labels = synthetic_series(
            n_train=n_train, n_test=200, n_features=38, seed=i
        )
        for suffix, arr in [("train", train), ("test", test),
                            ("test_label", labels.astype(np.float32))]:
            with open(proc / f"machine-{group}_{suffix}.pkl", "wb") as f:
                pickle.dump(arr, f)

    cfg = RunConfig(
        dataset="SMD", lookback=20, epochs=1, bs=32, gru_hid_dim=16,
        fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(root),
        output_root=str(tmp_path / "output"), run_id="batchedrun",
    )
    results = run_sweep_batched(cfg)
    assert set(results) == {"1-1", "1-2"}
    for group in ("1-1", "1-2"):
        d = tmp_path / "output" / "SMD" / group / "batchedrun"
        assert (d / "model.msgpack").exists()
        assert (d / "config.txt").exists()
        assert (d / "summary.txt").exists()

    with open(tmp_path / "output" / "SMD" / "sweep_summary.json") as f:
        sweep = json.load(f)
    assert sweep["aggregate"]["bf_result"]["n_entities"] == 2
