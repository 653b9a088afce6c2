"""Dataset loading, normalization, and score adjustment.

Capabilities of reference ``utils.py:11-104,210-254`` with the same on-disk
layout (``datasets/.../processed/<name>_{train,test,test_label}.pkl``), minus
the sklearn/torch dependencies: min-max scaling is a pure-numpy fit on train
applied to test (reference ``utils.py:97-99``).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class MinMaxScaler:
    """Train-fitted min-max scaler (sklearn-equivalent: zero-range columns
    divide by 1)."""

    data_min: np.ndarray
    data_range: np.ndarray

    @classmethod
    def fit(cls, data: np.ndarray) -> "MinMaxScaler":
        lo = np.min(data, axis=0)
        hi = np.max(data, axis=0)
        rng = hi - lo
        rng = np.where(rng == 0.0, 1.0, rng)
        return cls(data_min=lo, data_range=rng)

    def transform(self, data: np.ndarray) -> np.ndarray:
        return (data - self.data_min) / self.data_range


def normalize_data(
    data: np.ndarray, scaler: Optional[MinMaxScaler] = None
) -> Tuple[np.ndarray, MinMaxScaler]:
    """NaN->0 then min-max scale (reference ``utils.py:11-22``)."""
    data = np.asarray(data, dtype=np.float32)
    if np.any(np.isnan(data)):
        data = np.nan_to_num(data)
    if scaler is None:
        scaler = MinMaxScaler.fit(data)
    return scaler.transform(data), scaler


def get_data_dim(dataset: str) -> int:
    """Reference ``utils.py:25-37``."""
    if dataset == "SMAP":
        return 25
    if dataset == "MSL":
        return 55
    if str(dataset).startswith("machine"):
        return 38
    raise ValueError(f"unknown dataset {dataset}")


def get_target_dims(dataset: str) -> Optional[List[int]]:
    """Reference ``utils.py:40-53``: SMAP/MSL model only the telemetry
    channel (dim 0); SMD models all 38."""
    if dataset in ("SMAP", "MSL"):
        return [0]
    if dataset == "SMD":
        return None
    raise ValueError(f"unknown dataset {dataset}")


def get_data(
    dataset: str,
    data_root: str = "datasets",
    max_train_size: Optional[int] = None,
    max_test_size: Optional[int] = None,
    normalize: bool = False,
    train_start: int = 0,
    test_start: int = 0,
):
    """Load processed pickles (reference ``utils.py:56-104``); returns
    ``((x_train, None), (x_test, y_test))``."""
    if str(dataset).startswith("machine"):
        prefix = os.path.join(data_root, "ServerMachineDataset", "processed")
    elif dataset in ("MSL", "SMAP"):
        prefix = os.path.join(data_root, "data", "processed")
    else:
        prefix = data_root

    train_end = None if max_train_size is None else train_start + max_train_size
    test_end = None if max_test_size is None else test_start + max_test_size

    x_dim = get_data_dim(dataset)
    with open(os.path.join(prefix, dataset + "_train.pkl"), "rb") as f:
        train_data = pickle.load(f).reshape((-1, x_dim))[train_start:train_end, :]
    try:
        with open(os.path.join(prefix, dataset + "_test.pkl"), "rb") as f:
            test_data = pickle.load(f).reshape((-1, x_dim))[test_start:test_end, :]
    except (KeyError, FileNotFoundError):
        test_data = None
    try:
        with open(os.path.join(prefix, dataset + "_test_label.pkl"), "rb") as f:
            test_label = pickle.load(f).reshape((-1))[test_start:test_end]
    except (KeyError, FileNotFoundError):
        test_label = None

    if normalize:
        train_data, scaler = normalize_data(train_data, scaler=None)
        if test_data is not None:
            test_data, _ = normalize_data(test_data, scaler=scaler)

    return (np.asarray(train_data, np.float32), None), (
        None if test_data is None else np.asarray(test_data, np.float32),
        test_label,
    )


def adjust_anomaly_scores(
    scores: np.ndarray,
    dataset: str,
    is_train: bool,
    lookback: int,
    data_root: str = "datasets",
) -> np.ndarray:
    """MSL/SMAP channel-concatenation fixup (reference ``utils.py:210-254``):
    zero scores within +/-20 steps of channel boundaries, then min-max
    normalize each channel segment individually."""
    if dataset.upper() not in ("SMAP", "MSL"):
        return scores

    import pandas as pd

    adjusted = scores.copy()
    if is_train:
        md = pd.read_csv(os.path.join(data_root, "data", f"{dataset.lower()}_train_md.csv"))
    else:
        md = pd.read_csv(os.path.join(data_root, "data", "labeled_anomalies.csv"))
        md = md[md["spacecraft"] == dataset.upper()]
    md = md[md["chan_id"] != "P-2"]
    md = md.sort_values(by=["chan_id"])

    sep_cuma = np.cumsum(md["num_values"].values) - lookback
    sep_cuma_trim = sep_cuma[:-1]
    buffer = np.arange(1, 20)
    i_remov = np.sort(
        np.concatenate(
            (
                sep_cuma_trim,
                np.array([i + buffer for i in sep_cuma_trim]).flatten(),
                np.array([i - buffer for i in sep_cuma_trim]).flatten(),
            )
        )
    )
    i_remov = i_remov[(i_remov < len(adjusted)) & (i_remov >= 0)]
    i_remov = np.sort(np.unique(i_remov))
    if len(i_remov) != 0:
        adjusted[i_remov] = 0

    # Normalize each concatenated channel segment individually
    s = [0] + sep_cuma.tolist()
    for c_start, c_end in [(s[i], s[i + 1]) for i in range(len(s) - 1)]:
        e_s = adjusted[c_start : c_end + 1]
        if len(e_s) == 0:
            continue
        denom = np.max(e_s) - np.min(e_s)
        adjusted[c_start : c_end + 1] = (
            (e_s - np.min(e_s)) / denom if denom != 0 else e_s - np.min(e_s)
        )
    return adjusted
