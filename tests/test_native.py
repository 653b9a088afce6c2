"""Native host-ops tests: build, CSV parse parity with genfromtxt,
point-adjust + bf-search parity with the python implementations."""

import os

import numpy as np
import pytest

from mtad_gat_tpu.inference.eval_methods import adjust_predicts, bf_search
from mtad_gat_tpu.native import (
    bf_search_native,
    csv_load_f32,
    native_available,
    point_adjust_native,
)

requires_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@requires_native
def test_csv_parse_matches_genfromtxt(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((50, 38)).astype(np.float32)
    path = tmp_path / "m.txt"
    np.savetxt(path, arr, delimiter=",")
    ours = csv_load_f32(str(path))
    want = np.genfromtxt(path, dtype=np.float32, delimiter=",")
    np.testing.assert_allclose(ours, want, rtol=1e-6)

    # 1-D label files
    labels = (rng.random(30) < 0.2).astype(np.float32)
    lp = tmp_path / "labels.txt"
    np.savetxt(lp, labels, delimiter=",")
    ours1 = csv_load_f32(str(lp))
    assert ours1.shape == (30,)
    np.testing.assert_allclose(ours1, labels, rtol=1e-6)


@requires_native
def test_point_adjust_native_parity():
    rng = np.random.default_rng(1)
    for trial in range(10):
        n = 400
        label = (rng.random(n) < 0.08).astype(int)
        for _ in range(3):
            label[1:] = np.maximum(label[1:], label[:-1] * (rng.random(n - 1) < 0.7))
        score = rng.random(n) + label * rng.random(n)
        th = float(np.quantile(score, 0.9))
        want, lat_want = adjust_predicts(score, label, th, calc_latency=True)
        got, lat_got = point_adjust_native((score > th), label)
        np.testing.assert_array_equal(got.astype(bool), np.asarray(want, bool))
        assert lat_got == pytest.approx(lat_want, rel=1e-12)


@requires_native
def test_bf_search_native_parity():
    rng = np.random.default_rng(2)
    n = 600
    label = (rng.random(n) < 0.05).astype(int)
    for _ in range(3):
        label[1:] = np.maximum(label[1:], label[:-1] * (rng.random(n - 1) < 0.7))
    score = rng.random(n) + label * rng.random(n)

    native = bf_search_native(score, label, 0.01, 2.0, 100)
    python = bf_search(score, label, start=0.01, end=2, step_num=100,
                       verbose=False, use_native=False)
    for k in ("f1", "precision", "recall", "TP", "FP", "FN"):
        assert native[k] == pytest.approx(python[k], rel=1e-9)
    assert native["threshold"] == pytest.approx(python["threshold"], rel=1e-9)
    assert native["latency"] == pytest.approx(python["latency"], rel=1e-9)
