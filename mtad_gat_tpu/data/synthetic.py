"""Synthetic multivariate series with injected anomalies.

Used by the test suite and benchmarks (the raw SMD/NASA series are not
shipped with the reference checkout), and for the large-graph scaling configs
(e.g. the 4096-feature synthetic graph in BASELINE.json). Generates coupled
sinusoidal channels plus noise, with contiguous anomaly segments injected as
level shifts / amplitude bursts in the test split.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def synthetic_series(
    n_train: int = 2000,
    n_test: int = 1000,
    n_features: int = 8,
    anomaly_segments: int = 4,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (train (n_train,k), test (n_test,k), labels (n_test,))."""
    rng = np.random.default_rng(seed)
    t_train = np.arange(n_train)
    t_test = np.arange(n_test) + n_train

    freqs = rng.uniform(0.01, 0.05, size=n_features)
    phases = rng.uniform(0, 2 * np.pi, size=n_features)
    # Couple channels through a shared latent factor so the feature graph has
    # structure to attend over.
    latent_train = np.sin(0.02 * t_train)[:, None]
    latent_test = np.sin(0.02 * t_test)[:, None]
    mix = rng.uniform(0.3, 1.0, size=(1, n_features))

    def base(t, latent):
        sig = np.sin(np.outer(t, freqs) + phases) + latent * mix
        return sig + 0.05 * rng.standard_normal((len(t), n_features))

    train = base(t_train, latent_train).astype(np.float32)
    test = base(t_test, latent_test).astype(np.float32)
    labels = np.zeros(n_test, dtype=np.int64)

    seg_len = max(5, n_test // (anomaly_segments * 8))
    for _ in range(anomaly_segments):
        start = int(rng.integers(0, n_test - seg_len))
        chans = rng.choice(n_features, size=max(1, n_features // 3), replace=False)
        kind = rng.integers(0, 2)
        if kind == 0:
            test[start : start + seg_len, chans] += rng.uniform(1.5, 3.0)
        else:
            test[start : start + seg_len, chans] *= rng.uniform(2.5, 4.0)
        labels[start : start + seg_len] = 1

    return train, test, labels
