"""Fleet serving: vmapped multi-entity streaming scorer must reproduce E
independent OnlineScorers record-for-record, and its state must
save/restore mid-stream. No reference counterpart (the reference has
neither serving nor multi-entity execution)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.inference import OnlineFleetScorer, OnlineScorer
from mtad_gat_tpu.models import MTADGAT

K, W, E = 5, 12, 3


@pytest.fixture(scope="module")
def fleet():
    cfg = MTADGATConfig(
        n_features=K, window_size=W, out_dim=K, gru_hid_dim=8,
        forecast_hid_dim=8, forecast_n_layers=1, recon_hid_dim=8,
        recon_n_layers=1, dropout=0.0,
    )
    model = MTADGAT(cfg)
    per_entity = [
        model.init(jax.random.PRNGKey(s), jnp.zeros((1, W, K)))["params"]
        for s in range(E)
    ]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *per_entity)
    return model, per_entity, stacked


def _streams(n):
    rng = np.random.default_rng(2)
    return rng.standard_normal((E, n, K)).astype(np.float32)


def test_fleet_matches_independent_scorers(fleet):
    model, per_entity, stacked = fleet
    xs = _streams(60)

    fs = OnlineFleetScorer(model, stacked, E, W, K, smoothing_span=5)
    train = _streams(40)
    train_recs = fs.update_many(train)
    for e in range(E):
        fs.fit_threshold(
            e, np.array([r["score"] for r in train_recs[e]]),
            method="epsilon",
        )
    got = fs.update_many(xs)

    for e in range(E):
        solo = OnlineScorer(model, per_entity[e], W, K, smoothing_span=5)
        solo_train = solo.update_many(train[e])
        solo.fit_threshold(
            np.array([r["score"] for r in solo_train]), method="epsilon"
        )
        want = solo.update_many(xs[e])
        assert [r["t"] for r in got[e]] == [r["t"] for r in want]
        np.testing.assert_allclose(
            [r["score"] for r in got[e]], [r["score"] for r in want],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            [r["threshold"] for r in got[e]],
            [r["threshold"] for r in want], rtol=1e-6,
        )
        assert all(r["entity"] == e for r in got[e])


def test_fleet_spot_and_padding(fleet):
    model, _, stacked = fleet
    xs = _streams(50)

    a = OnlineFleetScorer(model, stacked, E, W, K)
    train = _streams(60)
    tr = a.update_many(train)
    for e in range(E):
        a.fit_threshold(e, np.array([r["score"] for r in tr[e]]),
                        method="spot")
    ra = a.update_many(xs)

    b = OnlineFleetScorer(model, stacked, E, W, K)
    tr_b = b.update_many(train, pad_to=60)
    for e in range(E):
        b.fit_threshold(e, np.array([r["score"] for r in tr_b[e]]),
                        method="spot")
    rb = b.update_many(xs[:, :30], pad_to=30)
    rb2 = b.update_many(xs[:, 30:], pad_to=30)
    for e in range(E):
        np.testing.assert_array_equal(
            [r["score"] for r in ra[e]],
            [r["score"] for r in rb[e] + rb2[e]],
        )
        assert [r["is_anomaly"] for r in ra[e]] == [
            r["is_anomaly"] for r in rb[e] + rb2[e]
        ]


def test_fleet_state_resume(fleet, tmp_path):
    model, _, stacked = fleet
    xs = _streams(50)
    train = _streams(40)

    base = OnlineFleetScorer(model, stacked, E, W, K)
    tr = base.update_many(train)
    for e in range(E):
        base.fit_threshold(e, np.array([r["score"] for r in tr[e]]),
                           method="epsilon")
    want = base.update_many(xs)

    part = OnlineFleetScorer(model, stacked, E, W, K)
    tr2 = part.update_many(train)
    for e in range(E):
        part.fit_threshold(e, np.array([r["score"] for r in tr2[e]]),
                           method="epsilon")
    first = part.update_many(xs[:, :20])
    state = str(tmp_path / "fleet.state")
    part.save_state(state)

    resumed = OnlineFleetScorer(model, stacked, E, W, K)
    resumed.load_state_file(state)
    rest = resumed.update_many(xs[:, 20:])
    for e in range(E):
        got = first[e] + rest[e]
        assert [r["t"] for r in got] == [r["t"] for r in want[e]]
        np.testing.assert_array_equal(
            [r["score"] for r in got], [r["score"] for r in want[e]]
        )


def test_fleet_ragged_streams_match_solo(fleet):
    """update_ragged: entities bring DIFFERENT numbers of points per
    dispatch (incl. zero) — each entity's records equal its own standalone
    scorer fed the same stream, and per-entity positions stay independent."""
    model, per_entity, stacked = fleet
    rng = np.random.default_rng(4)
    streams = [
        rng.standard_normal((n, K)).astype(np.float32)
        for n in (70, 45, 58)
    ]

    fs = OnlineFleetScorer(model, stacked, E, W, K)
    cursors = [0] * E
    got = [[] for _ in range(E)]
    step_sizes = [(7, 3, 0), (0, 9, 12), (11, 6, 5), (70, 45, 58)]
    for sizes in step_sizes:
        chunk = []
        for e in range(E):
            take = min(sizes[e], len(streams[e]) - cursors[e])
            chunk.append(streams[e][cursors[e]:cursors[e] + take])
            cursors[e] += take
        recs = fs.update_ragged(chunk, pad_to=70)
        for e in range(E):
            got[e].extend(recs[e])

    for e in range(E):
        solo = OnlineScorer(model, per_entity[e], W, K)
        want = solo.update_many(streams[e][:cursors[e]])
        assert [r["t"] for r in got[e]] == [r["t"] for r in want]
        np.testing.assert_allclose(
            [r["score"] for r in got[e]], [r["score"] for r in want],
            rtol=1e-5, atol=1e-6,
        )


def test_fleet_state_rejects_reordered_entities(fleet, tmp_path):
    """Resuming a fleet state with reordered/renamed entities must fail —
    a silent load would swap every entity's ring buffer and threshold."""
    model, _, stacked = fleet
    fs = OnlineFleetScorer(model, stacked, E, W, K)
    fs.labels = ["1-1", "1-2", "1-3"]
    fs.update_many(_streams(30))
    state = str(tmp_path / "f.state")
    fs.save_state(state)

    reordered = OnlineFleetScorer(model, stacked, E, W, K)
    reordered.labels = ["1-2", "1-1", "1-3"]
    with pytest.raises(ValueError, match="same entities in the same order"):
        reordered.load_state_file(state)

    spanned = OnlineFleetScorer(model, stacked, E, W, K, smoothing_span=7)
    spanned.labels = ["1-1", "1-2", "1-3"]
    with pytest.raises(ValueError, match="smoothing_span"):
        spanned.load_state_file(state)

    # a scorer with NO labels adopts the saved ones on load, so the order
    # guard survives a resume-then-save cycle (a re-save with labels=None
    # would otherwise strip it permanently from the state file)
    unlabeled = OnlineFleetScorer(model, stacked, E, W, K)
    assert unlabeled.labels is None
    unlabeled.load_state_file(state)
    assert unlabeled.labels == ["1-1", "1-2", "1-3"]
    resaved = str(tmp_path / "f2.state")
    unlabeled.save_state(resaved)
    reordered2 = OnlineFleetScorer(model, stacked, E, W, K)
    reordered2.labels = ["1-2", "1-1", "1-3"]
    with pytest.raises(ValueError, match="same entities in the same order"):
        reordered2.load_state_file(resaved)
