"""End-to-end pipeline test: preprocess-shaped synthetic SMD entity ->
train -> predict -> summary/outputs -> reload via predict path -> Plotter.

This is the CPU-runnable minimum slice of SURVEY.md §7 step 7.
"""

import json
import os
import pickle

import numpy as np
import pytest

from mtad_gat_tpu.cli.predict_cli import resolve_model_dir
from mtad_gat_tpu.cli.train_cli import run_training
from mtad_gat_tpu.config import RunConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.utils.plotting import Plotter


@pytest.fixture(scope="module")
def smd_like_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    proc = root / "ServerMachineDataset" / "processed"
    os.makedirs(proc)
    train, test, labels = synthetic_series(
        n_train=500, n_test=300, n_features=38, seed=3
    )
    for name, arr in [
        ("machine-1-1_train.pkl", train),
        ("machine-1-1_test.pkl", test),
        ("machine-1-1_test_label.pkl", labels.astype(np.float32)),
    ]:
        with open(proc / name, "wb") as f:
            pickle.dump(arr, f)
    return root


def test_full_pipeline(smd_like_root, tmp_path):
    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=2, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    save_path = run_training(cfg, run_id="01012026_120000")

    # Outputs exist
    for fname in ("summary.txt", "config.txt", "model.msgpack",
                  "train_output.pkl", "test_output.pkl",
                  "train_losses.png", "validation_losses.png"):
        assert os.path.exists(os.path.join(save_path, fname)), fname

    with open(os.path.join(save_path, "summary.txt")) as f:
        summary = json.load(f)
    assert 0.0 <= summary["bf_result"]["f1"] <= 1.0
    # bf-search upper-bounds the other methods on the same scores
    assert summary["bf_result"]["f1"] >= summary["epsilon_result"]["f1"] - 1e-9

    # Config round-trip
    cfg2 = RunConfig.load(os.path.join(save_path, "config.txt"))
    assert cfg2.lookback == cfg.lookback
    assert cfg2.dataset == "SMD"

    # Run-dir resolution like predict.py
    resolved = resolve_model_dir(str(out_root / "SMD" / "1-1"), "-1")
    assert os.path.abspath(resolved) == os.path.abspath(save_path)

    # Plotter over the run artifacts
    plotter = Plotter(str(out_root / "SMD" / "1-1"), model_id="-1")
    res = plotter.result_summary()
    assert "bf_result" in res
    plotter.plot_feature(0, save_path=os.path.join(save_path, "feat0.png"))
    plotter.plot_global_predictions(save_path=os.path.join(save_path, "global.png"))
    plotter.plot_anomaly_segments(save_path=os.path.join(save_path, "segments.png"))
    assert os.path.exists(os.path.join(save_path, "feat0.png"))

    # standalone predict entry point on the trained run (predict.py surface)
    import sys
    from unittest import mock

    from mtad_gat_tpu.cli import predict_cli

    argv = [
        "predict.py", "--dataset", "SMD", "--group", "1-1", "--model_id", "-1",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--load_scores", "true",
    ]
    with mock.patch.object(sys, "argv", argv):
        predict_cli.main()
    # numbered summary written alongside the original
    assert os.path.exists(os.path.join(save_path, "summary_1.txt"))


def test_serve_cli_streams_records(smd_like_root, tmp_path, monkeypatch, capsys):
    """serve.py end-to-end: train a run, then stream the test series through
    the serving CLI from a CSV file and check the JSONL record stream
    (chunked dispatch, epsilon alarm; no reference counterpart — the
    reference cannot serve streams)."""
    import sys

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_training(cfg, run_id="01012026_130000")

    # stream = the processed test series as CSV rows
    import pickle as _pickle

    with open(os.path.join(
        str(smd_like_root), "ServerMachineDataset", "processed",
        "machine-1-1_test.pkl",
    ), "rb") as f:
        test_series = _pickle.load(f)[:120]
    stream_csv = tmp_path / "stream.csv"
    np.savetxt(stream_csv, test_series, delimiter=",")
    out_jsonl = tmp_path / "records.jsonl"

    from mtad_gat_tpu.cli import serve_cli

    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--dataset", "SMD", "--group", "1-1",
        "--model_id", "01012026_130000",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--input", str(stream_csv), "--output", str(out_jsonl),
        "--chunk", "17", "--threshold_method", "epsilon",
        "--log_tensorboard", "False",
    ])
    serve_cli.main()

    records = [json.loads(line) for line in out_jsonl.read_text().splitlines()]
    # window primed from the train tail => every streamed point is scored
    assert len(records) == 120
    assert all(np.isfinite(r["score"]) for r in records)
    assert all(r["threshold"] == records[0]["threshold"] for r in records)
    assert [r["t"] for r in records] == list(range(20, 140))
    assert any(isinstance(r["is_anomaly"], bool) for r in records)

    # normalization parity: the CLI applies the train-fitted scaler to the
    # RAW stream, so streamed scores must equal the offline pipeline's
    # (serve record i scores test point i thanks to train-tail priming;
    # offline row j scores test point j+lookback)
    import pandas as pd

    test_df = pd.read_pickle(
        os.path.join(str(out_root), "SMD", "1-1", "01012026_130000",
                     "test_output.pkl")
    )
    offline = test_df["A_Score_Global"].to_numpy()
    streamed = np.array([r["score"] for r in records])
    np.testing.assert_allclose(streamed[20:], offline[:100], atol=1e-5)


def test_latest_run_resolution_with_custom_run_ids(tmp_path):
    """--model_id -1 must resolve runs pinned with custom --run_id names
    (mtime order) mixed with datetime-named runs — the reference only ever
    has datetime names, but --run_id is our extension and '-1' crashing on
    it was a real quick-start bug."""
    import time

    from mtad_gat_tpu.utils.plotting import Plotter

    root = tmp_path / "SMD" / "1-1"
    for name in ("01012026_120000", "my_experiment", "02012026_120000"):
        os.makedirs(root / name)
        time.sleep(0.05)

    resolved = resolve_model_dir(str(root), "-1")
    # my_experiment's mtime is older than 02012026's... mtimes are NOW for
    # all three, so the newest-by-mtime custom dir wins over parsed dates
    # from january — assert it resolves WITHOUT crashing and to a real dir
    assert os.path.isdir(resolved)

    # a literal custom id resolves directly
    assert resolve_model_dir(str(root), "my_experiment").endswith("my_experiment")

    p = Plotter.__new__(Plotter)
    p.result_path = str(root)
    p.model_id = "-1"
    assert os.path.isdir(p._resolve())


def test_serve_cli_use_mov_av_matches_offline_smoothing(
    smd_like_root, tmp_path, monkeypatch
):
    """serve.py on a use_mov_av run (VERDICT r4 weak #3): served scores must
    equal the offline EWM-smoothed raw scores (pandas ewm(span).mean() over
    the offline A_Score_Global restarted at the stream start), and the
    threshold must be calibrated on SMOOTHED train scores — the quantity the
    offline evaluation thresholds on (reference prediction.py:132-163)."""
    import sys

    import pandas as pd

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        use_mov_av=True,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_training(cfg, run_id="01012026_140000")
    run_dir = os.path.join(str(out_root), "SMD", "1-1", "01012026_140000")

    with open(os.path.join(
        str(smd_like_root), "ServerMachineDataset", "processed",
        "machine-1-1_test.pkl",
    ), "rb") as f:
        test_series = pickle.load(f)[:90]
    stream_csv = tmp_path / "mov_stream.csv"
    np.savetxt(stream_csv, test_series, delimiter=",")
    out_jsonl = tmp_path / "mov_records.jsonl"

    from mtad_gat_tpu.cli import serve_cli

    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--dataset", "SMD", "--group", "1-1",
        "--model_id", "01012026_140000",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--input", str(stream_csv), "--output", str(out_jsonl),
        "--chunk", "13", "--threshold_method", "epsilon",
        "--log_tensorboard", "False",
    ])
    serve_cli.main()

    records = [json.loads(line) for line in out_jsonl.read_text().splitlines()]
    assert len(records) == 90

    # expected: serve's exact pipeline minus smoothing (prime with the
    # normalized train tail, score the scaler-transformed stream raw), then
    # pandas EWM with the reference's span over those raw streaming scores.
    # (Offline test_output rows can't be compared directly: its row j is
    # test index j+window, while serve scores from test index 0 by priming
    # the window with the train tail.)
    import pandas as pd

    from mtad_gat_tpu.data import get_data
    from mtad_gat_tpu.data.loading import normalize_data
    from mtad_gat_tpu.inference import OnlineScorer, find_epsilon
    from mtad_gat_tpu.training import Trainer

    span = max(1, int(256 * cfg.lookback * 0.05))
    (x_train, _), _ = get_data(
        "machine-1-1", data_root=str(smd_like_root), normalize=True
    )
    (raw_train, _), _ = get_data(
        "machine-1-1", data_root=str(smd_like_root), normalize=False
    )
    _, scaler = normalize_data(raw_train)
    trainer = Trainer(
        cfg.model_config(38, 38), cfg.train_config(),
        save_path=run_dir, log_dir=os.path.join(run_dir, "logs"),
    )
    trainer.load(os.path.join(run_dir, "model.msgpack"))
    raw_scorer = OnlineScorer(
        trainer.model, trainer.state.params, cfg.lookback, 38
    )
    raw_scorer.update_many(x_train[-cfg.lookback:])
    raw_records = raw_scorer.update_many(
        scaler.transform(np.nan_to_num(test_series.astype(np.float32)))
    )
    raw_scores = np.array([r["score"] for r in raw_records])
    want = pd.Series(raw_scores).ewm(span=span).mean().to_numpy()
    got = np.array([r["score"] for r in records])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)

    # threshold calibrated on SMOOTHED train scores (the cached column is
    # raw for SMD — the reference pickles unsmoothed columns)
    train_raw = pd.read_pickle(
        os.path.join(run_dir, "train_output.pkl")
    )["A_Score_Global"].to_numpy()
    sm_train = pd.Series(train_raw).ewm(span=span).mean().to_numpy()
    want_eps = float(find_epsilon(sm_train, reg_level=1))
    assert records[0]["threshold"] == pytest.approx(want_eps, rel=1e-9)

def test_serve_train_scores_cache_policy(tmp_path):
    """_train_scores (advisor r4 #2): the cached A_Score_Global column is
    only trusted when it IS the raw score — scale_scores runs and MSL/SMAP
    (channel-adjusted) runs must rescore via the Predictor instead."""
    import pandas as pd

    from mtad_gat_tpu.cli.serve_cli import _train_scores

    cached = pd.DataFrame({"A_Score_Global": np.arange(5.0)})
    cached.to_pickle(tmp_path / "train_output.pkl")

    class _Cfg:
        dataset = "SMD"
        scale_scores = False
        use_mov_av = False

    got = _train_scores(str(tmp_path), None, None, _Cfg, 0, None)
    np.testing.assert_array_equal(got, np.arange(5.0))  # raw cache reused

    class _Rescored(Exception):
        pass

    def _boom(*a, **k):
        raise _Rescored

    import types

    dummy_trainer = types.SimpleNamespace(
        model=None, state=types.SimpleNamespace(params=None)
    )

    import mtad_gat_tpu.inference as inf
    import pytest as _pytest

    for ds, scale in [("SMD", True), ("MSL", False), ("SMAP", False)]:
        class _C:
            dataset = ds
            scale_scores = scale
            use_mov_av = False
            lookback = 20
            gamma = 1.0
            bs = 32
            data_root = "unused"

        with _pytest.MonkeyPatch.context() as mp:
            mp.setattr(inf, "Predictor", _boom)
            with _pytest.raises(_Rescored):
                _train_scores(str(tmp_path), dummy_trainer, None, _C, 0, None)


def test_serve_cli_spot_threshold(smd_like_root, tmp_path, monkeypatch):
    """serve.py with --threshold_method spot: streaming POT arms from the
    training scores and re-fits the GPD tail online — thresholds evolve
    with the stream (unlike the fixed epsilon) and every record carries the
    streaming alarm decision."""
    import sys

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_training(cfg, run_id="01012026_150000")

    with open(os.path.join(
        str(smd_like_root), "ServerMachineDataset", "processed",
        "machine-1-1_test.pkl",
    ), "rb") as f:
        test_series = pickle.load(f)[:150]
    stream_csv = tmp_path / "spot_stream.csv"
    np.savetxt(stream_csv, test_series, delimiter=",")
    out_jsonl = tmp_path / "spot_records.jsonl"

    from mtad_gat_tpu.cli import serve_cli

    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--dataset", "SMD", "--group", "1-1",
        "--model_id", "01012026_150000",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--input", str(stream_csv), "--output", str(out_jsonl),
        "--chunk", "32", "--threshold_method", "spot",
        "--log_tensorboard", "False",
    ])
    serve_cli.main()

    records = [json.loads(line) for line in out_jsonl.read_text().splitlines()]
    assert len(records) == 150
    assert all(np.isfinite(r["threshold"]) for r in records)
    assert all(isinstance(r["is_anomaly"], bool) for r in records)
    # the streaming-POT threshold matches replaying the same scores through
    # SPOT.step armed identically from the cached raw train scores
    import pandas as pd

    from mtad_gat_tpu.inference import SPOT

    run_dir = os.path.join(str(out_root), "SMD", "1-1", "01012026_150000")
    train_scores = pd.read_pickle(
        os.path.join(run_dir, "train_output.pkl")
    )["A_Score_Global"].to_numpy()
    from mtad_gat_tpu.config import lookup_pot_params

    level, q, _ = lookup_pot_params("SMD", "1-1", cfg.level, cfg.q)
    spot = SPOT(q)
    spot.fit(np.asarray(train_scores, np.float64), np.empty(0))
    spot.initialize(level=level)
    for r in records:
        want_thresh = None
        is_anom = spot.step(r["score"])
        want_thresh = float(spot.extreme_quantile)
        assert r["is_anomaly"] == is_anom
        assert r["threshold"] == pytest.approx(want_thresh, rel=1e-12)


def test_serve_sidecar_raw_score_cache(smd_like_root, tmp_path):
    """When the reference pickle cache is unusable, _train_scores rescores
    ONCE and persists a raw-score sidecar (train_scores_raw.npy); the next
    server start reads it instead of re-running the Predictor."""
    import types

    from mtad_gat_tpu.cli.serve_cli import _train_scores
    from mtad_gat_tpu.data import get_data
    from mtad_gat_tpu.training import Trainer

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_dir = run_training(cfg, run_id="01012026_160000")
    os.remove(os.path.join(run_dir, "train_output.pkl"))

    (x_train, _), _ = get_data(
        "machine-1-1", data_root=str(smd_like_root), normalize=True
    )
    trainer = Trainer(
        cfg.model_config(38, 38), cfg.train_config(),
        save_path=run_dir, log_dir=os.path.join(run_dir, "logs"),
    )
    trainer.load(os.path.join(run_dir, "model.msgpack"))
    scfg = types.SimpleNamespace(
        dataset="SMD", scale_scores=True, use_mov_av=False,
        lookback=20, gamma=1.0, bs=32, data_root=str(smd_like_root),
    )
    first = _train_scores(run_dir, trainer, x_train, scfg, 38, None)
    sidecar = os.path.join(run_dir, "train_scores_raw.npy")
    assert os.path.exists(sidecar)
    # second start: served from the sidecar even with the Predictor broken
    import pytest as _pytest

    import mtad_gat_tpu.inference as inf

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(inf, "Predictor",
                   lambda *a, **k: (_ for _ in ()).throw(AssertionError))
        second = _train_scores(run_dir, trainer, x_train, scfg, 38, None)
    np.testing.assert_array_equal(first, second)


def test_serve_cli_state_file_kill_and_resume(
    smd_like_root, tmp_path, monkeypatch
):
    """serve.py --state_file: two server sessions over a split stream emit
    exactly the records of one uninterrupted session (ring buffer, EWM,
    SPOT state, and position resume from the persisted state), and
    --emit_features adds the top-K per-feature scores."""
    import sys

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_training(cfg, run_id="01012026_170000")

    with open(os.path.join(
        str(smd_like_root), "ServerMachineDataset", "processed",
        "machine-1-1_test.pkl",
    ), "rb") as f:
        test_series = pickle.load(f)[:120]

    from mtad_gat_tpu.cli import serve_cli

    def serve(stream_rows, out_name, state=None, extra=(), out_file=None):
        stream_csv = tmp_path / f"{out_name}.csv"
        np.savetxt(stream_csv, stream_rows, delimiter=",")
        out_jsonl = tmp_path / (out_file or f"{out_name}.jsonl")
        argv = [
            "serve.py", "--dataset", "SMD", "--group", "1-1",
            "--model_id", "01012026_170000",
            "--data_root", str(smd_like_root),
            "--output_root", str(out_root),
            "--input", str(stream_csv), "--output", str(out_jsonl),
            "--chunk", "16", "--threshold_method", "spot",
            "--log_tensorboard", "False", *extra,
        ]
        if state:
            argv += ["--state_file", state]
        monkeypatch.setattr(sys, "argv", argv)
        serve_cli.main()
        return [json.loads(l) for l in out_jsonl.read_text().splitlines()]

    want = serve(test_series, "uninterrupted",
                 extra=("--emit_features", "3"))
    assert all(len(r["top_features"]) == 3 for r in want)
    # top_features are (index, score) sorted descending
    for r in want[:5]:
        scores = [s for _, s in r["top_features"]]
        assert scores == sorted(scores, reverse=True)

    state = str(tmp_path / "serve.state")
    # both sessions share ONE output file: the resumed session must APPEND
    # (truncation would destroy the pre-crash records, which the scorer has
    # resumed past and can never regenerate)
    first = serve(test_series[:50], "part1", state=state,
                  out_file="shared.jsonl")
    assert os.path.exists(state)
    serve(test_series[50:], "part2", state=state, out_file="shared.jsonl")
    got = [
        json.loads(l)
        for l in (tmp_path / "shared.jsonl").read_text().splitlines()
    ]
    assert len(first) == 50
    assert [r["t"] for r in got] == [r["t"] for r in want]
    np.testing.assert_array_equal(
        [r["score"] for r in got], [r["score"] for r in want]
    )
    np.testing.assert_array_equal(
        [r["threshold"] for r in got], [r["threshold"] for r in want]
    )
    assert [r["is_anomaly"] for r in got] == [r["is_anomaly"] for r in want]


def test_serve_cli_resume_same_file_skips_served_rows(
    smd_like_root, tmp_path, monkeypatch
):
    """Restarting serve.py with the SAME --input file resumes at the line
    after the last served row instead of re-scoring the file from row 0
    (which would emit every point twice at shifted timesteps and advance
    the threshold state through replayed data). The persisted state carries
    the input path + line position; appended rows — the `tail -f` growth
    pattern — are served exactly once."""
    import sys

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_training(cfg, run_id="01012026_190000")

    with open(os.path.join(
        str(smd_like_root), "ServerMachineDataset", "processed",
        "machine-1-1_test.pkl",
    ), "rb") as f:
        test_series = pickle.load(f)[:100]

    from mtad_gat_tpu.cli import serve_cli

    def rows_csv(rows):
        return "".join(",".join(f"{v:.6f}" for v in r) + "\n" for r in rows)

    stream = tmp_path / "grow.csv"
    out = tmp_path / "grow.jsonl"
    state = str(tmp_path / "grow.state")

    def serve():
        monkeypatch.setattr(sys, "argv", [
            "serve.py", "--dataset", "SMD", "--group", "1-1",
            "--model_id", "01012026_190000",
            "--data_root", str(smd_like_root), "--output_root", str(out_root),
            "--input", str(stream), "--output", str(out),
            "--chunk", "16", "--state_file", state,
            "--log_tensorboard", "False",
        ])
        serve_cli.main()
        return [json.loads(l) for l in out.read_text().splitlines()]

    stream.write_text(rows_csv(test_series[:60]))
    first = serve()
    assert len(first) == 60

    # restart on the identical (unchanged) file: nothing new to serve
    again = serve()
    assert len(again) == 60  # appended nothing — no duplicate records

    # the file grows (tail -f pattern): only the new rows are served
    with open(stream, "a") as f:
        f.write(rows_csv(test_series[60:]))
    grown = serve()
    # priming consumes the lookback-long train tail, so the 100 streamed
    # rows score at t = lookback .. lookback+99 — each exactly once
    assert [r["t"] for r in grown] == list(
        range(cfg.lookback, cfg.lookback + 100)
    )
    # and the full record stream equals one uninterrupted session
    stream2 = tmp_path / "oracle.csv"
    out2 = tmp_path / "oracle.jsonl"
    stream2.write_text(rows_csv(test_series))
    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--dataset", "SMD", "--group", "1-1",
        "--model_id", "01012026_190000",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--input", str(stream2), "--output", str(out2),
        "--chunk", "16", "--log_tensorboard", "False",
    ])
    serve_cli.main()
    want = [json.loads(l) for l in out2.read_text().splitlines()]
    np.testing.assert_array_equal(
        [r["score"] for r in grown], [r["score"] for r in want]
    )


def test_serve_cli_sigterm_persists_state(smd_like_root, tmp_path):
    """A real `kill <pid>` (SIGTERM) on a live serve.py process persists the
    streaming state via the signal handler, and a resumed session continues
    with the SAME record stream an uninterrupted run produces."""
    import subprocess
    import sys
    import time as _time

    out_root = tmp_path / "output"
    cfg = RunConfig(
        dataset="SMD", group="1-1", lookback=20, epochs=1, bs=32,
        gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
        log_tensorboard=False, data_root=str(smd_like_root),
        output_root=str(out_root),
    )
    run_training(cfg, run_id="01012026_180000")

    with open(os.path.join(
        str(smd_like_root), "ServerMachineDataset", "processed",
        "machine-1-1_test.pkl",
    ), "rb") as f:
        test_series = pickle.load(f)[:80]

    def rows_csv(rows):
        return "\n".join(
            ",".join(f"{v:.6f}" for v in r) for r in rows
        ) + "\n"

    base_args = [
        sys.executable, "serve.py", "--dataset", "SMD", "--group", "1-1",
        "--model_id", "01012026_180000",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--chunk", "8", "--flush_ms", "200",
        "--threshold_method", "epsilon", "--log_tensorboard", "False",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    state = str(tmp_path / "sig.state")
    out1 = str(tmp_path / "sig1.jsonl")

    proc = subprocess.Popen(
        base_args + ["--input", "-", "--output", out1,
                     "--state_file", state],
        stdin=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd="/root/repo", text=True,
    )
    proc.stdin.write(rows_csv(test_series[:40]))
    proc.stdin.flush()
    # wait until the server has scored (and state-saved) the 40 points;
    # generous deadline — under a loaded machine the subprocess's cold
    # start (imports + XLA compiles) alone can take minutes
    deadline = _time.monotonic() + 300
    while _time.monotonic() < deadline:
        if os.path.exists(out1) and len(
            open(out1).read().splitlines()
        ) >= 40 and os.path.exists(state):
            break
        _time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail(
            "server did not score 40 points within the readiness deadline "
            f"(stderr: {proc.stderr.read()[-2000:]})"
        )
    proc.terminate()  # SIGTERM, stdin still open: the handler must fire
    rc = proc.wait(timeout=60)
    assert rc == 143
    assert os.path.exists(state)
    records1 = [json.loads(l) for l in open(out1).read().splitlines()]
    assert len(records1) == 40

    # resume with the remaining rows
    stream2 = tmp_path / "sig2.csv"
    stream2.write_text(rows_csv(test_series[40:]))
    out2 = str(tmp_path / "sig2.jsonl")
    subprocess.run(
        base_args + ["--input", str(stream2), "--output", out2,
                     "--state_file", state],
        check=True, env=env, cwd="/root/repo", capture_output=True,
    )
    records2 = [json.loads(l) for l in open(out2).read().splitlines()]

    # uninterrupted oracle
    out3 = str(tmp_path / "sig3.jsonl")
    stream3 = tmp_path / "sig3.csv"
    stream3.write_text(rows_csv(test_series))
    subprocess.run(
        base_args + ["--input", str(stream3), "--output", out3],
        check=True, env=env, cwd="/root/repo", capture_output=True,
    )
    want = [json.loads(l) for l in open(out3).read().splitlines()]
    got = records1 + records2
    assert [r["t"] for r in got] == [r["t"] for r in want]
    np.testing.assert_array_equal(
        [r["score"] for r in got], [r["score"] for r in want]
    )


def test_serve_cli_fleet_mode(smd_like_root, tmp_path, monkeypatch):
    """serve.py fleet mode (--group 1-1,1-2): two machines' UNALIGNED
    streams served from one process match each machine's standalone serve
    records — per-entity scalers, thresholds, and positions all
    independent."""
    import sys

    # second entity with its own distinct data
    proc = (
        smd_like_root / "ServerMachineDataset" / "processed"
    )
    if not os.path.exists(proc / "machine-1-2_train.pkl"):
        train2, test2, labels2 = synthetic_series(
            n_train=500, n_test=300, n_features=38, seed=9
        )
        for name, arr in [
            ("machine-1-2_train.pkl", train2),
            ("machine-1-2_test.pkl", test2),
            ("machine-1-2_test_label.pkl", labels2.astype(np.float32)),
        ]:
            with open(proc / name, "wb") as f:
                pickle.dump(arr, f)

    out_root = tmp_path / "output"
    for g, rid in (("1-1", "01012026_190000"), ("1-2", "01012026_190001")):
        cfg = RunConfig(
            dataset="SMD", group=g, lookback=20, epochs=1, bs=32,
            gru_hid_dim=16, fc_hid_dim=16, fc_n_layers=1, recon_hid_dim=16,
            log_tensorboard=False, data_root=str(smd_like_root),
            output_root=str(out_root),
        )
        run_training(cfg, run_id=rid)

    def load_test(g):
        with open(proc / f"machine-{g}_test.pkl", "rb") as f:
            return pickle.load(f)

    streams = {"1-1": load_test("1-1")[:70], "1-2": load_test("1-2")[:40]}
    csvs = {}
    for g, arr in streams.items():
        csvs[g] = tmp_path / f"fleet_{g}.csv"
        np.savetxt(csvs[g], arr, delimiter=",")

    from mtad_gat_tpu.cli import serve_cli

    fleet_out = tmp_path / "fleet.jsonl"
    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--dataset", "SMD", "--group", "1-1,1-2",
        "--model_id", "-1",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--input", f"{csvs['1-1']},{csvs['1-2']}",
        "--output", str(fleet_out),
        "--chunk", "16", "--threshold_method", "epsilon",
        "--log_tensorboard", "False",
        "--state_file", str(tmp_path / "fleet.state"),
    ])
    serve_cli.main()
    fleet_records = [
        json.loads(l) for l in fleet_out.read_text().splitlines()
    ]
    by_group = {}
    for r in fleet_records:
        by_group.setdefault(r["group"], []).append(r)
    assert len(by_group["1-1"]) == 70
    assert len(by_group["1-2"]) == 40
    assert os.path.exists(tmp_path / "fleet.state")

    # resumed fleet session: continues from the state file without
    # re-calibrating, t positions continue per entity
    more = {"1-1": load_test("1-1")[70:90], "1-2": load_test("1-2")[40:65]}
    csvs2 = {}
    for g, arr in more.items():
        csvs2[g] = tmp_path / f"fleet2_{g}.csv"
        np.savetxt(csvs2[g], arr, delimiter=",")
    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--dataset", "SMD", "--group", "1-1,1-2",
        "--model_id", "-1",
        "--data_root", str(smd_like_root), "--output_root", str(out_root),
        "--input", f"{csvs2['1-1']},{csvs2['1-2']}",
        "--output", str(fleet_out),
        "--chunk", "16", "--threshold_method", "epsilon",
        "--log_tensorboard", "False",
        "--state_file", str(tmp_path / "fleet.state"),
    ])
    serve_cli.main()
    all_records = [
        json.loads(l) for l in fleet_out.read_text().splitlines()
    ]
    by_group2 = {}
    for r in all_records:
        by_group2.setdefault(r["group"], []).append(r)
    assert len(by_group2["1-1"]) == 90 and len(by_group2["1-2"]) == 65
    # t continues per entity across the restart (priming offset = lookback)
    assert [r["t"] for r in by_group2["1-1"]] == list(range(20, 110))
    assert [r["t"] for r in by_group2["1-2"]] == list(range(20, 85))

    # standalone oracle per machine
    for g in ("1-1", "1-2"):
        solo_out = tmp_path / f"solo_{g}.jsonl"
        monkeypatch.setattr(sys, "argv", [
            "serve.py", "--dataset", "SMD", "--group", g,
            "--model_id", "-1",
            "--data_root", str(smd_like_root),
            "--output_root", str(out_root),
            "--input", str(csvs[g]), "--output", str(solo_out),
            "--chunk", "16", "--threshold_method", "epsilon",
            "--log_tensorboard", "False",
        ])
        serve_cli.main()
        want = [json.loads(l) for l in solo_out.read_text().splitlines()]
        got = by_group[g]
        assert [r["t"] for r in got] == [r["t"] for r in want]
        np.testing.assert_allclose(
            [r["score"] for r in got], [r["score"] for r in want],
            rtol=1e-5, atol=1e-6,
        )
        assert [r["threshold"] for r in got] == [
            r["threshold"] for r in want
        ]
