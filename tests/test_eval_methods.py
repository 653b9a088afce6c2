"""Parity tests for thresholding/evaluation vs the reference implementations
(point-adjust, calc_point2point, find_epsilon, bf_search, SPOT)."""


import numpy as np
import pytest

from tests.conftest import requires_reference

from mtad_gat_tpu.inference import (
    SPOT,
    adjust_predicts,
    bf_search,
    calc_point2point,
    epsilon_eval,
    find_epsilon,
    pot_eval,
)



def _ref_eval():
    from tests.torch_ref import load_ref

    return load_ref("eval_methods")


def _random_case(rng, n=500, p_anom=0.05, p_pred=0.1):
    label = (rng.random(n) < p_anom).astype(int)
    # grow some segments
    for _ in range(3):
        label[1:] = np.maximum(label[1:], label[:-1] * (rng.random(n - 1) < 0.7))
    score = rng.random(n) + label * rng.random(n)
    return score, label


@requires_reference
def test_adjust_predicts_parity():
    ref = _ref_eval()
    rng = np.random.default_rng(0)
    for trial in range(20):
        score, label = _random_case(rng)
        threshold = float(np.quantile(score, 0.9))
        ours, lat_ours = adjust_predicts(score, label, threshold, calc_latency=True)
        want, lat_want = ref.adjust_predicts(score.copy(), label.copy(), threshold, calc_latency=True)
        np.testing.assert_array_equal(np.asarray(ours, bool), np.asarray(want, bool))
        assert abs(lat_ours - lat_want) < 1e-9


@requires_reference
def test_adjust_predicts_segment_at_zero():
    """Quirk: backward fill never reaches index 0 (eval_methods.py:41)."""
    ref = _ref_eval()
    label = np.array([1, 1, 1, 0, 0], dtype=int)
    score = np.array([0.0, 0.0, 10.0, 0.0, 0.0])
    ours = adjust_predicts(score, label, 5.0)
    want = ref.adjust_predicts(score.copy(), label.copy(), 5.0)
    np.testing.assert_array_equal(np.asarray(ours, bool), np.asarray(want, bool))
    assert not ours[0]  # index 0 stays unadjusted


@requires_reference
def test_calc_point2point_parity():
    ref = _ref_eval()
    rng = np.random.default_rng(1)
    pred = (rng.random(300) < 0.2).astype(int)
    label = (rng.random(300) < 0.1).astype(int)
    ours = calc_point2point(pred, label)
    want = ref.calc_point2point(pred, label)
    np.testing.assert_allclose(ours, want, rtol=1e-12)


@requires_reference
def test_find_epsilon_parity():
    ref = _ref_eval()
    rng = np.random.default_rng(2)
    for trial in range(5):
        errors = np.abs(rng.standard_normal(800)) + (rng.random(800) < 0.02) * 5
        for reg in (0, 1, 2):
            assert find_epsilon(errors, reg) == pytest.approx(
                ref.find_epsilon(errors, reg), rel=1e-12
            )


@requires_reference
def test_bf_search_parity():
    ref = _ref_eval()
    rng = np.random.default_rng(3)
    score, label = _random_case(rng)
    ours = bf_search(score, label, start=0.01, end=2, step_num=50, verbose=False)
    want = ref.bf_search(score.copy(), label.copy(), start=0.01, end=2, step_num=50, verbose=False)
    for k in ("f1", "precision", "recall", "threshold"):
        assert ours[k] == pytest.approx(want[k], rel=1e-9)


@requires_reference
def test_spot_static_parity():
    from tests.torch_ref import load_ref

    ref_spot = load_ref("spot")

    rng = np.random.default_rng(4)
    init = rng.gamma(2.0, 1.0, 2000)
    stream = rng.gamma(2.0, 1.0, 500)

    ours = SPOT(q=1e-3)
    ours.fit(init, stream)
    ours.initialize(level=0.98)
    r_ours = ours.run(dynamic=False, with_alarm=False)

    theirs = ref_spot.SPOT(q=1e-3)
    theirs.fit(init.copy(), stream.copy())
    theirs.initialize(level=0.98, verbose=False)
    r_theirs = theirs.run(dynamic=False, with_alarm=False)

    assert np.mean(r_ours["thresholds"]) == pytest.approx(
        np.mean(r_theirs["thresholds"]), rel=1e-6
    )


@requires_reference
def test_spot_dynamic_parity():
    from tests.torch_ref import load_ref

    ref_spot = load_ref("spot")

    rng = np.random.default_rng(5)
    init = rng.gamma(2.0, 1.0, 800)
    stream = rng.gamma(2.0, 1.0, 60)

    ours = SPOT(q=1e-3)
    ours.fit(init, stream)
    ours.initialize(level=0.98)
    r_ours = ours.run(dynamic=True, with_alarm=False)

    theirs = ref_spot.SPOT(q=1e-3)
    theirs.fit(init.copy(), stream.copy())
    theirs.initialize(level=0.98, verbose=False)
    r_theirs = theirs.run(dynamic=True, with_alarm=False)

    np.testing.assert_allclose(
        np.asarray(r_ours["thresholds"]), np.asarray(r_theirs["thresholds"]), rtol=1e-6
    )


@requires_reference
def test_pot_eval_parity():
    ref = _ref_eval()
    rng = np.random.default_rng(6)
    score, label = _random_case(rng, n=800)
    init_score = rng.random(1500)
    ours = pot_eval(init_score, score, label, q=1e-3, level=0.98)
    want = ref.pot_eval(init_score.copy(), score.copy(), label.copy(), q=1e-3, level=0.98)
    for k in ("f1", "precision", "recall", "threshold"):
        assert ours[k] == pytest.approx(want[k], rel=1e-6)


@requires_reference
def test_epsilon_eval_parity():
    ref = _ref_eval()
    rng = np.random.default_rng(7)
    score, label = _random_case(rng, n=800)
    train_scores = np.abs(rng.standard_normal(1500))
    for reg in (0, 1, 2):
        ours = epsilon_eval(train_scores, score, label, reg_level=reg)
        want = ref.epsilon_eval(train_scores.copy(), score.copy(), label.copy(), reg_level=reg)
        for k in ("f1", "precision", "recall", "threshold"):
            assert ours[k] == pytest.approx(want[k], rel=1e-9)


@requires_reference
def test_spot_dynamic_fast_path_bit_identical_to_reference():
    """The parallel-schedule fast path for run(dynamic=True,
    with_alarm=False) (VERDICT r3 item #6) must be BIT-identical to the
    reference's sequential streaming loop — thresholds and alarms — on a
    stream large enough to take the fast path (K >= 64 refits)."""
    from tests.torch_ref import load_ref

    ref_spot = load_ref("spot")

    rng = np.random.default_rng(7)
    init = rng.gamma(2.0, 1.0, 3000)
    stream = rng.gamma(2.0, 1.0, 6000)

    ours = SPOT(q=1e-3)
    ours.fit(init, stream)
    ours.initialize(level=0.98)
    r_ours = ours.run(dynamic=True, with_alarm=False)

    theirs = ref_spot.SPOT(q=1e-3)
    theirs.fit(init.copy(), stream.copy())
    theirs.initialize(level=0.98, verbose=False)
    r_theirs = theirs.run(dynamic=True, with_alarm=False)

    assert len(r_ours["thresholds"]) == len(r_theirs["thresholds"])
    assert all(
        float(a) == float(b)
        for a, b in zip(r_ours["thresholds"], r_theirs["thresholds"])
    )
    assert list(r_ours["alarms"]) == list(r_theirs["alarms"])


def test_spot_dynamic_fast_guard_falls_back_to_sequential():
    """When the extreme quantile can dip below the init threshold (huge q
    makes r = n*q/Nt > 1), the static-schedule precondition fails; the fast
    path must detect it and fall back to the exact sequential loop — the
    result must still equal a pure step() replay."""
    rng = np.random.default_rng(8)
    init = rng.gamma(2.0, 1.0, 2000)
    stream = rng.gamma(2.0, 1.0, 3000)

    a = SPOT(q=0.5)           # absurd q: quantile < init threshold
    a.fit(init, stream)
    a.initialize(level=0.98)
    assert a._run_dynamic_noalarm_fast(np.asarray(stream, np.float64)) is None
    r = a.run(dynamic=True, with_alarm=False)

    b = SPOT(q=0.5)
    b.fit(init, stream)
    b.initialize(level=0.98)
    th = []
    for x in stream:
        b.step(float(x), with_alarm=False)
        th.append(b.extreme_quantile)
    assert all(float(u) == float(v) for u, v in zip(r["thresholds"], th))


def test_spot_dynamic_fast_equals_step_loop():
    """Fast path vs the incremental step() loop (the online-serving path):
    identical thresholds and final state on a normal stream."""
    rng = np.random.default_rng(9)
    init = rng.gamma(2.0, 1.0, 4000)
    stream = rng.gamma(2.0, 1.0, 8000)

    a = SPOT(q=1e-3)
    a.fit(init, stream)
    a.initialize(level=0.98)
    r = a.run(dynamic=True, with_alarm=False)

    b = SPOT(q=1e-3)
    b.fit(init, stream)
    b.initialize(level=0.98)
    th = []
    for x in stream:
        b.step(float(x), with_alarm=False)
        th.append(b.extreme_quantile)

    assert all(float(u) == float(v) for u, v in zip(r["thresholds"], th))
    assert a.Nt == b.Nt and a.n == b.n
    assert float(a.extreme_quantile) == float(b.extreme_quantile)


@requires_reference
def test_calc_seq_parity():
    """calc_seq (reference eval_methods.py:160-163): point-adjusted metric
    tuple + latency at a single threshold."""
    from tests.torch_ref import load_ref

    ref_eval = load_ref("eval_methods")

    from mtad_gat_tpu.inference import calc_seq

    rng = np.random.default_rng(11)
    score, label = _random_case(rng, n=600)
    th = float(np.quantile(score, 0.9))
    (ours_m, ours_lat) = calc_seq(score, label, th)
    (ref_m, ref_lat) = ref_eval.calc_seq(score, label, th)
    np.testing.assert_allclose(np.asarray(ours_m), np.asarray(ref_m), rtol=1e-12)
    assert ours_lat == pytest.approx(ref_lat, rel=1e-12)


@requires_reference
def test_series_color_height_parity():
    """get_series_color / get_y_height (reference utils.py:192-208),
    including the all-branches-return-black quirk."""
    from tests.torch_ref import load_ref

    ref_utils = load_ref("utils")

    from mtad_gat_tpu.utils.plotting import get_series_color, get_y_height

    rng = np.random.default_rng(12)
    cases = [np.ones(50), np.zeros(50), rng.random(50), np.full(50, 0.96),
             rng.random(50) * 3]
    for y in cases:
        assert get_series_color(y) == ref_utils.get_series_color(y)
        assert get_y_height(y) == pytest.approx(ref_utils.get_y_height(y))
