"""Parity: MSL/SMAP raw-data preprocessor vs the reference.

The real NASA raw files are not shipped, so this synthesizes a raw layout
(``labeled_anomalies.csv`` + per-channel .npy train/test arrays) and runs both
the reference ``preprocess.load_data`` (``/root/reference/preprocess.py:53-89``)
and our ``preprocess_nasa`` on it, comparing the three output pickles
bit-exactly — including the P-2 channel drop, the row sort by channel id, the
inclusive anomaly-range labels, and the channel concatenation order.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from mtad_gat_tpu.data.preprocess import preprocess_nasa

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


def _make_raw(root, spacecraft_rows):
    """spacecraft_rows: list of (chan_id, spacecraft, anomalies, length)."""
    data_dir = os.path.join(root, "data")
    for cat in ("train", "test"):
        os.makedirs(os.path.join(data_dir, cat), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = ["chan_id,spacecraft,anomaly_sequences,class,num_values"]
    for chan, craft, anoms, length in spacecraft_rows:
        lines.append(f'{chan},{craft},"{anoms}","[point]",{length}')
        # test length must match num_values for label alignment; train differs
        test = rng.standard_normal((length, 5)).astype(np.float32)
        train = rng.standard_normal((length + 7, 5)).astype(np.float32)
        np.save(os.path.join(data_dir, "test", chan + ".npy"), test)
        np.save(os.path.join(data_dir, "train", chan + ".npy"), train)
    with open(os.path.join(data_dir, "labeled_anomalies.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


@pytest.mark.parametrize("dataset", ["MSL", "SMAP"])
def test_nasa_preprocess_matches_reference(tmp_path, monkeypatch, dataset):
    root = tmp_path / "datasets"
    # Deliberately unsorted rows, both spacecraft mixed, plus a P-2 row that
    # must be dropped (reference preprocess.py:61) and overlapping anomaly
    # ranges to exercise the inclusive end index.
    rows = [
        ("T-3", "MSL", [[5, 10], [30, 44]], 50),
        ("A-1", "MSL", [[0, 3]], 40),
        ("P-2", "SMAP", [[1, 2]], 30),  # always dropped
        ("E-5", "SMAP", [[10, 29]], 33),
        ("B-7", "SMAP", [[2, 2], [2, 6]], 21),
        ("M-9", "MSL", [], 17),
    ]
    _make_raw(str(root), rows)

    # Reference run (relative paths; chdir into the sandbox)
    monkeypatch.chdir(tmp_path)
    from tests.torch_ref import load_ref

    ref_preprocess = load_ref("preprocess")

    ref_preprocess.load_data(dataset)
    ref_dir = tmp_path / "ref_processed"
    os.rename(root / "data" / "processed", ref_dir)

    preprocess_nasa(dataset, data_root=str(root))
    out_dir = root / "data" / "processed"

    for cat in ("train", "test", "test_label"):
        ref = _load(ref_dir / f"{dataset}_{cat}.pkl")
        ours = _load(out_dir / f"{dataset}_{cat}.pkl")
        assert ref.dtype == ours.dtype, (dataset, cat)
        assert ref.shape == ours.shape, (dataset, cat)
        assert np.array_equal(ref, ours), (dataset, cat)
