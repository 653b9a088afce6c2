"""Online streaming scorer: per-point scores must EQUAL the offline
Predictor.get_score dataframe (same model/params/series), SPOT.step must
replay SPOT.run exactly, and the end-to-end alarm path fires on an injected
anomaly. Reference counterpart: none — the reference scores offline only
(prediction.py:36-94)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.inference import OnlineScorer, Predictor, SPOT
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


def test_online_scores_match_offline_predictor(model_and_params, tmp_path):
    model, params = model_and_params
    _, test, _ = synthetic_series(n_train=80, n_test=90, n_features=K)

    offline = Predictor(
        model, params, W, K,
        {"dataset": "SMD", "target_dims": None, "scale_scores": False,
         "q": 1e-3, "level": 0.98, "dynamic_pot": False, "use_mov_av": False,
         "gamma": 1.0, "reg_level": 1, "save_path": str(tmp_path)},
        batch_size=16,
    ).get_score(test)

    scorer = OnlineScorer(model, params, W, K, gamma=1.0)
    records = scorer.update_many(test)

    assert len(records) == test.shape[0] - W
    got_global = np.array([r["score"] for r in records])
    np.testing.assert_allclose(
        got_global, offline["A_Score_Global"].to_numpy(), atol=1e-5
    )
    for i in range(K):
        np.testing.assert_allclose(
            np.array([r["forecast"][i] for r in records]),
            offline[f"Forecast_{i}"].to_numpy(), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.array([r["a_score"][i] for r in records]),
            offline[f"A_Score_{i}"].to_numpy(), atol=1e-5,
        )


def test_online_target_dims(model_and_params):
    cfg = MTADGATConfig(
        n_features=K, window_size=W, out_dim=1, gru_hid_dim=16,
        forecast_hid_dim=16, forecast_n_layers=1, recon_hid_dim=16,
        recon_n_layers=1, dropout=0.0,
    )
    model = MTADGAT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, W, K)))["params"]
    _, test, _ = synthetic_series(n_train=60, n_test=40, n_features=K)
    scorer = OnlineScorer(model, params, W, K, target_dims=[0])
    records = scorer.update_many(test)
    assert records and records[0]["a_score"].shape == (1,)


def test_spot_step_replays_run():
    rng = np.random.default_rng(0)
    train = rng.standard_normal(500)
    stream = rng.standard_normal(300)
    stream[100:110] += 6.0

    batch = SPOT(1e-3)
    batch.fit(train, stream)
    batch.initialize(level=0.98)
    out = batch.run(with_alarm=True, dynamic=True)

    inc = SPOT(1e-3)
    inc.fit(train, np.empty(0))
    inc.initialize(level=0.98)
    alarms, ths = [], []
    for i, x in enumerate(stream):
        if inc.step(x, with_alarm=True):
            alarms.append(i)
        ths.append(inc.extreme_quantile)

    assert alarms == out["alarms"]
    np.testing.assert_allclose(ths, out["thresholds"])


def test_online_end_to_end_alarm(model_and_params):
    """Epsilon-armed streaming detection alarms inside an injected anomaly
    segment and stays mostly quiet elsewhere."""
    model, params = model_and_params
    train, test, labels = synthetic_series(n_train=150, n_test=120, n_features=K)

    scorer = OnlineScorer(model, params, W, K)
    train_scores = np.array([r["score"] for r in scorer.update_many(train)])

    scorer2 = OnlineScorer(model, params, W, K)
    scorer2.fit_threshold(train_scores, method="epsilon", reg_level=1)
    records = scorer2.update_many(test)
    flags = np.array([r["is_anomaly"] for r in records])
    seg = labels[W:].astype(bool)
    assert flags[seg].any(), "no alarm inside the anomaly segment"

    # spot mode runs too
    scorer3 = OnlineScorer(model, params, W, K)
    scorer3.fit_threshold(train_scores, method="spot", q=1e-3, level=0.95)
    recs = scorer3.update_many(test)
    assert all("threshold" in r for r in recs)


def test_update_many_chunks_match_per_point(model_and_params):
    """The chunked lax.scan path (one dispatch per chunk, VERDICT r3 item
    #5) must produce the same record stream as the per-point update loop —
    including chunks that straddle the warmup boundary and size-1 chunks."""
    model, params = model_and_params
    _, test, _ = synthetic_series(n_train=60, n_test=70, n_features=K)

    a = OnlineScorer(model, params, W, K, gamma=1.0)
    a.fit_threshold(np.abs(np.random.default_rng(0).standard_normal(200)) + 0.1,
                    method="epsilon")
    per_point = []
    for x in test:
        rec = a.update(x)
        if rec is not None:
            per_point.append(rec)

    b = OnlineScorer(model, params, W, K, gamma=1.0)
    b.fit_threshold(np.abs(np.random.default_rng(0).standard_normal(200)) + 0.1,
                    method="epsilon")
    chunked = []
    i = 0
    for size in (5, 1, W, 3, 1000):     # last chunk clips to the remainder
        chunked.extend(b.update_many(test[i : i + size]))
        i += size
    assert i >= len(test)

    assert len(per_point) == len(chunked) == len(test) - W
    for ra, rb in zip(per_point, chunked):
        assert ra["t"] == rb["t"]
        np.testing.assert_allclose(rb["score"], ra["score"], atol=1e-6)
        np.testing.assert_allclose(rb["forecast"], ra["forecast"], atol=1e-6)
        np.testing.assert_allclose(rb["recon"], ra["recon"], atol=1e-6)
        np.testing.assert_allclose(rb["a_score"], ra["a_score"], atol=1e-6)
        assert ra["is_anomaly"] == rb["is_anomaly"]
        assert ra["threshold"] == rb["threshold"]


def test_streaming_ewm_matches_offline_smooth(model_and_params):
    """Streaming EWM (smoothing_span) is record-exact vs the offline
    pandas ``ewm(span, adjust=True).mean()`` (``Predictor._smooth``,
    reference ``prediction.py:132-135``) — including the warmup prefix and
    both the per-point and chunked paths."""
    import pandas as pd

    model, params = model_and_params
    _, test, _ = synthetic_series(n_train=80, n_test=120, n_features=K)
    span = 7

    raw = OnlineScorer(model, params, W, K)
    raw_scores = np.array([r["score"] for r in raw.update_many(test)])
    want = pd.Series(raw_scores).ewm(span=span).mean().to_numpy()

    # chunked path (update_many), uneven chunk boundaries on purpose
    sm = OnlineScorer(model, params, W, K, smoothing_span=span)
    records = []
    for start in range(0, test.shape[0], 17):
        records.extend(sm.update_many(test[start:start + 17]))
    got = np.array([r["score"] for r in records])
    np.testing.assert_array_equal(got, want)  # bit-exact, not allclose
    np.testing.assert_array_equal(
        np.array([r["score_raw"] for r in records]), raw_scores
    )

    # per-point path
    sm2 = OnlineScorer(model, params, W, K, smoothing_span=span)
    got2 = np.array(
        [r["score"] for x in test if (r := sm2.update(x)) is not None]
    )
    np.testing.assert_array_equal(got2, want)


def test_streaming_ewm_nan_matches_pandas():
    """NaN scores follow pandas ``ewm`` semantics (ignore_na=False): the
    weight decays but the average is not blended with the NaN, and the
    stream RECOVERS at the next real observation — one bad point must not
    poison every later smoothed score (silently disabling all alarms)."""
    import pandas as pd

    rng = np.random.default_rng(3)
    for span, mutate in [
        (7, lambda v: v.__setitem__([5, 50, 51], np.nan)),  # NaN gaps
        (7, lambda v: v.__setitem__(0, np.nan)),            # NaN seed
        (13, lambda v: v.__setitem__(slice(0, 6), np.nan)),  # NaN prefix
    ]:
        vals = rng.standard_normal(150)
        mutate(vals)
        scorer = OnlineScorer.__new__(OnlineScorer)
        scorer.smoothing_span = span
        scorer._ewm_avg, scorer._ewm_old_wt = None, 1.0
        got = np.array([scorer._smooth_score(v) for v in vals])
        want = pd.Series(vals).ewm(span=span, adjust=True).mean().to_numpy()
        finite = np.isfinite(want)
        np.testing.assert_array_equal(np.isfinite(got), finite)
        np.testing.assert_array_equal(got[finite], want[finite])


def test_streaming_ewm_threshold_on_smoothed(model_and_params):
    """With smoothing armed, the alarm compares the SMOOTHED score against
    the threshold (the offline eval thresholds on smoothed scores,
    reference ``prediction.py:158-163``)."""
    model, params = model_and_params
    train, test, _ = synthetic_series(n_train=200, n_test=60, n_features=K)

    sm = OnlineScorer(model, params, W, K, smoothing_span=5)
    train_records = sm.update_many(train)
    sm.fit_threshold(
        np.array([r["score"] for r in train_records]), method="epsilon"
    )
    for r in sm.update_many(test):
        assert r["is_anomaly"] == (r["score"] > r["threshold"])
        assert "score_raw" in r


def test_update_many_pad_to_identical(model_and_params):
    """pad_to zero-pads a short chunk up to the compiled scan length; the
    masked carry makes records and subsequent state identical to the
    unpadded call (serving keeps ONE compiled program for variable live
    chunk sizes)."""
    model, params = model_and_params
    _, test, _ = synthetic_series(n_train=80, n_test=50, n_features=K)

    a = OnlineScorer(model, params, W, K)
    ra = a.update_many(test[:30]) + a.update_many(test[30:])  # 30 + 20

    b = OnlineScorer(model, params, W, K)
    rb = b.update_many(test[:30], pad_to=30) + b.update_many(
        test[30:], pad_to=30
    )

    assert [r["t"] for r in ra] == [r["t"] for r in rb]
    np.testing.assert_array_equal(
        [r["score"] for r in ra], [r["score"] for r in rb]
    )
    np.testing.assert_array_equal(a._buffer, b._buffer)
    np.testing.assert_array_equal(a._pending_forecast, b._pending_forecast)


def test_fit_threshold_resets_ewm_state(model_and_params):
    """fit_threshold restarts the streaming EWM: a calibration replay of
    the train series must not leak its EWM state into the stream (the
    offline smoother runs over each split as its own series, reference
    prediction.py:132-135)."""
    import pandas as pd

    model, params = model_and_params
    train, test, _ = synthetic_series(n_train=150, n_test=60, n_features=K)
    span = 9

    sm = OnlineScorer(model, params, W, K, smoothing_span=span)
    train_records = sm.update_many(train)          # EWM state advanced
    sm.fit_threshold(
        np.array([r["score"] for r in train_records]), method="epsilon"
    )
    got = np.array([r["score"] for r in sm.update_many(test)])

    raw = OnlineScorer(model, params, W, K)
    raw.update_many(train)                          # same window state
    raw_scores = np.array([r["score"] for r in raw.update_many(test)])
    want = pd.Series(raw_scores).ewm(span=span).mean().to_numpy()
    np.testing.assert_array_equal(got, want)


def test_state_save_load_resumes_bit_identically(model_and_params, tmp_path):
    """save_state/load_state mid-stream: the resumed scorer (fresh object,
    state file round trip) continues bit-identically to the uninterrupted
    one — ring buffer, pending forecast, EWM scalars, and streaming-POT
    state all carry over."""
    model, params = model_and_params
    train, test, _ = synthetic_series(n_train=300, n_test=80, n_features=K)

    def arm(s):
        recs = s.update_many(train)
        s.fit_threshold(
            np.array([r["score"] for r in recs])[:250], method="spot"
        )

    base = OnlineScorer(model, params, W, K, smoothing_span=6)
    arm(base)
    want = base.update_many(test)

    part = OnlineScorer(model, params, W, K, smoothing_span=6)
    arm(part)
    first = part.update_many(test[:37])
    state_file = str(tmp_path / "scorer.state")
    part.save_state(state_file)

    resumed = OnlineScorer(model, params, W, K, smoothing_span=6)
    resumed.load_state_file(state_file)
    rest = resumed.update_many(test[37:])

    got = first + rest
    assert [r["t"] for r in got] == [r["t"] for r in want]
    np.testing.assert_array_equal(
        [r["score"] for r in got], [r["score"] for r in want]
    )
    np.testing.assert_array_equal(
        [r["threshold"] for r in got], [r["threshold"] for r in want]
    )
    assert [r["is_anomaly"] for r in got] == [r["is_anomaly"] for r in want]

    # guards: mismatched geometry / smoothing refuse to load
    import pytest as _pytest

    other = OnlineScorer(model, params, W, K)  # no smoothing
    with _pytest.raises(ValueError, match="smoothing_span"):
        other.load_state_file(state_file)


def test_dspot_threshold_method(model_and_params):
    """method='dspot': drift-aware streaming POT through the scorer —
    thresholds track the drift-adjusted level, alarms fire on the injected
    spike."""
    model, params = model_and_params
    rng = np.random.default_rng(9)
    train, test, _ = synthetic_series(n_train=700, n_test=80, n_features=K)

    s = OnlineScorer(model, params, W, K)
    train_recs = s.update_many(train)
    s.fit_threshold(
        np.array([r["score"] for r in train_recs]), method="dspot",
        q=1e-3, drift_depth=100,
    )
    recs = s.update_many(test)
    assert all(np.isfinite(r["threshold"]) for r in recs)
    # the drift-adjusted threshold is NOT constant (unlike epsilon)
    assert len({round(r["threshold"], 9) for r in recs}) > 1
