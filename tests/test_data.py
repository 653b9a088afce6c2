"""Data-layer tests: windowing semantics, normalization, preprocessing."""

import os
import pickle

import numpy as np
import jax.numpy as jnp

from mtad_gat_tpu.data import (
    gather_targets,
    gather_windows,
    get_data,
    get_data_dim,
    get_target_dims,
    normalize_data,
    num_windows,
    synthetic_series,
)
from mtad_gat_tpu.data.windows import batched_starts


def test_window_semantics_match_reference():
    """Window i = data[i:i+w], target = data[i+w:i+w+1], count = T - w
    (reference utils.py:107-120)."""
    T, k, w = 50, 3, 10
    data = np.arange(T * k, dtype=np.float32).reshape(T, k)
    n = num_windows(T, w)
    assert n == T - w
    starts = jnp.arange(n)
    x = np.asarray(gather_windows(jnp.asarray(data), starts, w))
    y = np.asarray(gather_targets(jnp.asarray(data), starts, w))
    for i in range(n):
        np.testing.assert_array_equal(x[i], data[i : i + w])
        np.testing.assert_array_equal(y[i], data[i + w : i + w + 1])


def test_num_windows_horizon_stays_in_bounds():
    """horizon > 1 clamps the window count so the last target gather stays
    inside the series — out-of-bounds jnp.take fills NaN and would poison
    the loss (the reference's horizon>1 silently truncates instead,
    utils.py:117; neither trains beyond the first step)."""
    T, k, w, h = 30, 2, 10, 3
    data = np.arange(T * k, dtype=np.float32).reshape(T, k)
    n = num_windows(T, w, h)
    assert n == T - w - (h - 1)
    assert num_windows(T, w) == T - w  # horizon 1 unchanged (parity)
    y = np.asarray(
        gather_targets(jnp.asarray(data), jnp.arange(n), w, horizon=h)
    )
    assert np.isfinite(y).all()
    np.testing.assert_array_equal(y[-1], data[T - h : T])


def test_get_data_rejects_width_mismatch(tmp_path):
    """A 2-D pickle whose width differs from the dataset table must be
    rejected: the reference's unconditional reshape would silently re-row
    it into interleaved garbage whenever the sizes divide."""
    import pickle

    d = tmp_path / "ServerMachineDataset" / "processed"
    d.mkdir(parents=True)
    bad = np.zeros((50, 19), np.float32)  # 50*19 divides 38: silent re-row
    for nm in ("machine-1-1_train", "machine-1-1_test"):
        with open(d / f"{nm}.pkl", "wb") as f:
            pickle.dump(bad, f)
    with pytest.raises(ValueError, match="19 features .* expects 38"):
        get_data("machine-1-1", data_root=str(tmp_path), normalize=False)


def test_batched_starts_mask():
    starts, mask, nb = batched_starts(10, 4)
    assert starts.shape == (3, 4)
    assert mask.sum() == 10
    assert nb == 3


def test_normalize_matches_sklearn():
    from sklearn.preprocessing import MinMaxScaler as SkScaler

    rng = np.random.default_rng(0)
    train = rng.standard_normal((100, 5)).astype(np.float32)
    test = rng.standard_normal((50, 5)).astype(np.float32)
    train[3, 2] = np.nan

    ours_train, scaler = normalize_data(train)
    ours_test, _ = normalize_data(test, scaler=scaler)

    clean = np.nan_to_num(train)
    sk = SkScaler().fit(clean)
    np.testing.assert_allclose(ours_train, sk.transform(clean), atol=1e-6)
    np.testing.assert_allclose(ours_test, sk.transform(test), atol=1e-6)


def test_dataset_tables():
    assert get_data_dim("SMAP") == 25
    assert get_data_dim("MSL") == 55
    assert get_data_dim("machine-1-1") == 38
    assert get_target_dims("SMAP") == [0]
    assert get_target_dims("MSL") == [0]
    assert get_target_dims("SMD") is None


def test_get_data_roundtrip(tmp_path):
    train, test, labels = synthetic_series(n_train=300, n_test=200, n_features=38)
    proc = tmp_path / "ServerMachineDataset" / "processed"
    os.makedirs(proc)
    for name, arr in [
        ("machine-9-9_train.pkl", train),
        ("machine-9-9_test.pkl", test),
        ("machine-9-9_test_label.pkl", labels),
    ]:
        with open(proc / name, "wb") as f:
            pickle.dump(arr, f)
    (x_train, _), (x_test, y_test) = get_data(
        "machine-9-9", data_root=str(tmp_path), normalize=True
    )
    assert x_train.shape == (300, 38)
    assert x_test.shape == (200, 38)
    assert y_test.shape == (200,)
    assert x_train.min() >= 0.0 and x_train.max() <= 1.0


def test_preprocess_smd(tmp_path):
    root = tmp_path
    base = root / "ServerMachineDataset"
    for cat in ("train", "test", "test_label"):
        os.makedirs(base / cat)
    rng = np.random.default_rng(0)
    train = rng.random((40, 38)).astype(np.float32)
    test = rng.random((30, 38)).astype(np.float32)
    labels = (rng.random(30) < 0.1).astype(np.float32)
    np.savetxt(base / "train" / "machine-1-1.txt", train, delimiter=",")
    np.savetxt(base / "test" / "machine-1-1.txt", test, delimiter=",")
    np.savetxt(base / "test_label" / "machine-1-1.txt", labels, delimiter=",")

    from mtad_gat_tpu.data.preprocess import preprocess

    preprocess("SMD", data_root=str(root))
    (x_train, _), (x_test, y_test) = get_data("machine-1-1", data_root=str(root))
    np.testing.assert_allclose(x_train, train, atol=1e-5)
    np.testing.assert_allclose(x_test, test, atol=1e-5)
    np.testing.assert_array_equal(y_test, labels)


def test_write_smd_like_runs_pipeline_shapes(tmp_path):
    """The synthetic-data CLI writes SMD-layout pickles that get_data loads
    directly (the no-downloads quick-start path)."""
    import pickle

    from mtad_gat_tpu.data.loading import get_data
    from mtad_gat_tpu.data.synthetic import write_smd_like

    # SMD entities are pinned to 38 features (reference utils.py:25-37)
    proc = write_smd_like(str(tmp_path), group="2-3", n_train=300,
                          n_test=200, n_features=38)
    assert os.path.isdir(proc)
    (x_train, _), (x_test, y_test) = get_data(
        "machine-2-3", data_root=str(tmp_path), normalize=True
    )
    assert x_train.shape == (300, 38)
    assert x_test.shape == (200, 38)
    assert y_test.shape == (200,)
    assert y_test.sum() > 0          # injected anomalies present
