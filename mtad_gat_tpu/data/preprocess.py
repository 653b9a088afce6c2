"""Raw -> processed dataset conversion.

Capabilities of reference ``preprocess.py:10-96`` with the same output layout:

- SMD: each ``machine-x-y.txt`` CSV under train/test/test_label becomes a
  float32 pickle ``processed/machine-x-y_{category}.pkl``.
- MSL/SMAP: parse ``labeled_anomalies.csv``, filter by spacecraft, drop
  channel P-2, build the boolean label vector from anomaly ranges, and
  concatenate all channels' .npy train/test arrays into one long series.
"""

from __future__ import annotations

import os
import pickle
from ast import literal_eval
from csv import reader as csv_reader
from typing import List

import numpy as np

from mtad_gat_tpu.native import csv_load_f32


def _dump(obj, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def preprocess_smd(data_root: str = "datasets") -> List[str]:
    dataset_folder = os.path.join(data_root, "ServerMachineDataset")
    output_folder = os.path.join(dataset_folder, "processed")
    os.makedirs(output_folder, exist_ok=True)
    done = []
    train_dir = os.path.join(dataset_folder, "train")
    if not os.path.isdir(train_dir):
        raise FileNotFoundError(f"{train_dir} not found")
    for filename in sorted(os.listdir(train_dir)):
        if not filename.endswith(".txt"):
            continue
        name = filename[: -len(".txt")]
        for category in ("train", "test", "test_label"):
            src = os.path.join(dataset_folder, category, filename)
            arr = csv_load_f32(src)  # native fast path, genfromtxt fallback
            _dump(arr, os.path.join(output_folder, f"{name}_{category}.pkl"))
        done.append(name)
    return done


def preprocess_nasa(dataset: str, data_root: str = "datasets") -> None:
    """MSL or SMAP (reference ``preprocess.py:53-89``)."""
    dataset_folder = os.path.join(data_root, "data")
    output_folder = os.path.join(dataset_folder, "processed")
    os.makedirs(output_folder, exist_ok=True)
    with open(os.path.join(dataset_folder, "labeled_anomalies.csv")) as f:
        rows = [row for row in csv_reader(f, delimiter=",")][1:]
    rows = sorted(rows, key=lambda k: k[0])
    data_info = [row for row in rows if row[1] == dataset and row[0] != "P-2"]

    labels = []
    for row in data_info:
        anomalies = literal_eval(row[2])
        length = int(row[-1])
        label = np.zeros([length], dtype=np.bool_)
        for anomaly in anomalies:
            label[anomaly[0] : anomaly[1] + 1] = True
        labels.extend(label)
    _dump(np.asarray(labels), os.path.join(output_folder, f"{dataset}_test_label.pkl"))

    for category in ("train", "test"):
        data = []
        for row in data_info:
            arr = np.load(os.path.join(dataset_folder, category, row[0] + ".npy"))
            data.extend(arr)
        _dump(np.asarray(data), os.path.join(output_folder, f"{dataset}_{category}.pkl"))


def preprocess(dataset: str, data_root: str = "datasets") -> None:
    ds = dataset.upper()
    if ds == "SMD":
        preprocess_smd(data_root)
    elif ds in ("MSL", "SMAP"):
        preprocess_nasa(ds, data_root)
    else:
        raise ValueError(f"unknown dataset {dataset}")
