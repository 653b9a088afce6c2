"""Golden end-to-end eval parity: run OUR thresholding/eval pipeline on the
reference's committed MSL run outputs (its saved global anomaly scores) and
reproduce its committed summary.txt numbers exactly.

This validates the entire scoring->thresholding->point-adjust->metrics chain
against the published baseline F1s (BASELINE.md rows: MSL epsilon/POT/bf)
without needing the raw NASA data.
"""

import json
import os

import numpy as np
import pytest

from tests.conftest import requires_reference

from mtad_gat_tpu.inference import bf_search, epsilon_eval, pot_eval

RUN = "/root/reference/output/MSL/27062021_111641"

pytestmark = [
    requires_reference,
    pytest.mark.skipif(
        not os.path.exists(os.path.join(RUN, "test_output.pkl")),
        reason="reference golden outputs not present",
    ),
]


@pytest.fixture(scope="module")
def golden():
    import pandas as pd

    train_df = pd.read_pickle(os.path.join(RUN, "train_output.pkl"))
    test_df = pd.read_pickle(os.path.join(RUN, "test_output.pkl"))
    with open(os.path.join(RUN, "summary.txt")) as f:
        summary = json.load(f)
    return (
        train_df["A_Score_Global"].values,
        test_df["A_Score_Global"].values,
        test_df["A_True_Global"].values,
        summary,
    )


def test_epsilon_matches_published(golden):
    train_s, test_s, labels, summary = golden
    # MSL reg_level = 0 (reference train.py:141)
    ours = epsilon_eval(train_s, test_s, labels, reg_level=0)
    want = summary["epsilon_result"]
    assert ours["f1"] == pytest.approx(want["f1"], abs=1e-9)
    assert ours["precision"] == pytest.approx(want["precision"], abs=1e-9)
    assert ours["recall"] == pytest.approx(want["recall"], abs=1e-9)
    assert ours["threshold"] == pytest.approx(want["threshold"], rel=1e-6)
    assert ours["latency"] == pytest.approx(want["latency"], rel=1e-6)
    assert ours["TP"] == want["TP"] and ours["FP"] == want["FP"] and ours["FN"] == want["FN"]


def test_pot_matches_published(golden):
    train_s, test_s, labels, summary = golden
    # MSL POT params: level=0.90, q=0.001 (reference train.py:126-134)
    ours = pot_eval(train_s, test_s, labels, q=0.001, level=0.90, dynamic=False)
    want = summary["pot_result"]
    assert ours["f1"] == pytest.approx(want["f1"], abs=1e-6)
    assert ours["precision"] == pytest.approx(want["precision"], abs=1e-6)
    assert ours["recall"] == pytest.approx(want["recall"], abs=1e-6)
    assert ours["threshold"] == pytest.approx(want["threshold"], rel=1e-5)


def test_bf_matches_published(golden):
    train_s, test_s, labels, summary = golden
    ours = bf_search(test_s, labels, start=0.01, end=2, step_num=100, verbose=False)
    want = summary["bf_result"]
    assert ours["f1"] == pytest.approx(want["f1"], abs=1e-9)
    assert ours["precision"] == pytest.approx(want["precision"], abs=1e-9)
    assert ours["recall"] == pytest.approx(want["recall"], abs=1e-9)
    assert ours["threshold"] == pytest.approx(want["threshold"], rel=1e-9)
