"""Parity for the SPOT variants (dSPOT / biSPOT / bidSPOT) vs the reference
implementations on shared streams."""


import numpy as np
import pytest

from tests.conftest import requires_reference

from mtad_gat_tpu.inference import biSPOT, bidSPOT, dSPOT
from mtad_gat_tpu.inference.spot import back_mean



def _ref_spot():
    from tests.torch_ref import load_ref

    ref = load_ref("spot")

    return ref


def _stream(seed=0, n_init=1500, n=120):
    rng = np.random.default_rng(seed)
    drift = np.linspace(0, 1.0, n_init + n)
    vals = rng.gamma(2.0, 1.0, n_init + n) + drift
    return vals[:n_init], vals[n_init:]


@requires_reference
def test_back_mean_matches_reference():
    ref = _ref_spot()
    rng = np.random.default_rng(1)
    x = rng.random(200)
    np.testing.assert_allclose(back_mean(x, 10), ref.backMean(x, 10), rtol=1e-12)


@requires_reference
def test_dspot_parity():
    ref = _ref_spot()
    init, stream = _stream(seed=2)

    ours = dSPOT(q=1e-3, depth=10)
    ours.fit(init, stream)
    ours.initialize()
    r_ours = ours.run(with_alarm=False)

    theirs = ref.dSPOT(q=1e-3, depth=10)
    theirs.fit(init.copy(), stream.copy())
    theirs.initialize(verbose=False)
    r_theirs = theirs.run(with_alarm=False)

    np.testing.assert_allclose(
        np.asarray(r_ours["thresholds"]), np.asarray(r_theirs["thresholds"]),
        rtol=1e-6,
    )
    assert r_ours["alarms"] == r_theirs["alarms"]


@requires_reference
def test_bispot_parity():
    ref = _ref_spot()
    init, stream = _stream(seed=3)

    ours = biSPOT(q=1e-3)
    ours.fit(init, stream)
    ours.initialize()
    r_ours = ours.run(with_alarm=True)

    theirs = ref.biSPOT(q=1e-3)
    theirs.fit(init.copy(), stream.copy())
    theirs.initialize(verbose=False)
    r_theirs = theirs.run(with_alarm=True)

    np.testing.assert_allclose(
        np.asarray(r_ours["upper_thresholds"]),
        np.asarray(r_theirs["upper_thresholds"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r_ours["lower_thresholds"]),
        np.asarray(r_theirs["lower_thresholds"]), rtol=1e-6,
    )
    assert r_ours["alarms"] == r_theirs["alarms"]


@requires_reference
def test_bidspot_parity():
    ref = _ref_spot()
    init, stream = _stream(seed=4)

    ours = bidSPOT(q=1e-3, depth=10)
    ours.fit(init, stream)
    ours.initialize()
    r_ours = ours.run(with_alarm=True)

    theirs = ref.bidSPOT(q=1e-3, depth=10)
    theirs.fit(init.copy(), stream.copy())
    theirs.initialize(verbose=False)
    r_theirs = theirs.run(with_alarm=True)

    np.testing.assert_allclose(
        np.asarray(r_ours["upper_thresholds"]),
        np.asarray(r_theirs["upper_thresholds"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r_ours["lower_thresholds"]),
        np.asarray(r_theirs["lower_thresholds"]), rtol=1e-6,
    )
    assert r_ours["alarms"] == r_theirs["alarms"]


def test_dspot_step_replays_run_exactly():
    """dSPOT.step is the incrementalized body of dSPOT.run: alarms and
    drift-adjusted thresholds identical point-for-point, including the
    alarm-freezes-the-drift-window rule."""
    from mtad_gat_tpu.inference.spot import dSPOT

    rng = np.random.default_rng(7)
    drift = np.cumsum(rng.normal(0, 0.05, 2300))
    init = rng.gamma(2.0, 1.0, 2000) + drift[:2000]
    stream = rng.gamma(2.0, 1.0, 300) + drift[2000:]
    stream[150:160] += 12.0  # injected anomaly on top of the drift

    batch = dSPOT(q=1e-3, depth=50)
    batch.fit(init, stream)
    batch.initialize()
    want = batch.run(with_alarm=True)

    inc = dSPOT(q=1e-3, depth=50)
    inc.fit(init, np.empty(0))
    inc.initialize()
    got_alarms, got_th = [], []
    for i, x in enumerate(stream):
        if inc.step(float(x)):
            got_alarms.append(i)
        got_th.append(inc.last_threshold)

    assert got_alarms == list(want["alarms"])
    np.testing.assert_allclose(got_th, want["thresholds"], rtol=1e-12)
    assert got_alarms  # the injected anomaly actually fired
