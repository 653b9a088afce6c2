"""MultiEntityTrainer: E entities in one vmapped jitted step must match E
sequential Trainer runs per entity (same seed) to float tolerance — the
schedules, rng streams, and gating are exact; vmap only changes XLA fusion
order, so tiny float drift (~1e-6 after 2 epochs) is the expected envelope.
Includes entities with different series lengths (padded batches fully
gated out of params/opt/rng)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
from mtad_gat_tpu.training import MultiEntityTrainer, Trainer

CFG = dict(
    n_features=5, window_size=10, out_dim=5, kernel_size=7,
    gru_hid_dim=12, forecast_hid_dim=12, forecast_n_layers=1,
    recon_hid_dim=12, recon_n_layers=1,
)


def _series(lengths, k=5, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((t, k)).astype(np.float32) for t in lengths]


def _solo_losses(cfg, tcfg, series, tmp):
    t = Trainer(cfg, tcfg, save_path="", log_dir=str(tmp))
    t.init_state()
    t.fit(series)
    return t.losses, t.state.params


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_batched_matches_sequential_equal_lengths(tmp_path, dropout):
    cfg = MTADGATConfig(**CFG, dropout=dropout)
    tcfg = TrainConfig(epochs=2, val_split=0.2, bs=8, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    series = _series([80, 80, 80])

    solo = [_solo_losses(cfg, tcfg, s, tmp_path) for s in series]

    mt = MultiEntityTrainer(cfg, tcfg)
    mt.fit(series, verbose=False)

    for e in range(3):
        for key, vals in solo[e][0].items():
            np.testing.assert_allclose(
                mt.losses[e][key], vals, rtol=2e-4, atol=1e-5,
                err_msg=f"entity {e} {key}",
            )
        # trained parameters themselves match the solo run
        solo_p = solo[e][1]
        got_p = mt.entity_params(e)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            ),
            got_p, solo_p,
        )


def test_batched_matches_sequential_ragged_lengths(tmp_path):
    """Different series lengths => different batch counts; the padded batches
    must not perturb shorter entities (params/opt/rng gating)."""
    cfg = MTADGATConfig(**CFG, dropout=0.2)
    tcfg = TrainConfig(epochs=2, val_split=0.0, bs=8, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    series = _series([90, 40, 62])  # 10, 4(ceil 30/8), 7 batches

    solo = [_solo_losses(cfg, tcfg, s, tmp_path) for s in series]

    mt = MultiEntityTrainer(cfg, tcfg)
    mt.fit(series, verbose=False)

    for e in range(3):
        np.testing.assert_allclose(
            mt.losses[e]["train_total"], solo[e][0]["train_total"],
            rtol=2e-4, atol=1e-5, err_msg=f"entity {e}",
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            ),
            mt.entity_params(e), solo[e][1],
        )


def test_entities_actually_differ():
    """Sanity: different data per entity -> different trained params."""
    cfg = MTADGATConfig(**CFG, dropout=0.0)
    tcfg = TrainConfig(epochs=1, val_split=0.0, bs=8, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    mt = MultiEntityTrainer(cfg, tcfg)
    mt.fit(_series([60, 60]), verbose=False)
    p0 = jax.tree.leaves(mt.entity_params(0))[0]
    p1 = jax.tree.leaves(mt.entity_params(1))[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_entity_axis_sharded_over_mesh_matches_unsharded():
    """Entity-sharded fleet (entity axis over the mesh data axis — the
    embarrassingly-parallel sweep scale-out) matches the unsharded vmapped
    run on the 8-device farm."""
    from mtad_gat_tpu.parallel import make_mesh

    cfg = MTADGATConfig(**CFG, dropout=0.2)
    tcfg = TrainConfig(epochs=2, val_split=0.0, bs=8, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    series = _series([64] * 8)

    mt0 = MultiEntityTrainer(cfg, tcfg)
    mt0.fit(series, verbose=False)

    mesh = make_mesh(8, model_parallel=1)  # data axis = 8 = entity shards
    mt1 = MultiEntityTrainer(cfg, tcfg, mesh=mesh)
    mt1.fit(series, verbose=False)

    for e in range(8):
        np.testing.assert_allclose(
            mt1.losses[e]["train_total"], mt0.losses[e]["train_total"],
            rtol=2e-4, atol=1e-5, err_msg=f"entity {e}",
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        mt1.params, mt0.params,
    )


def test_entity_with_empty_val_split_records_no_val_entries(tmp_path):
    """An entity whose val split rounds to zero windows must record NO val
    losses (like its solo run), not NaNs, while other entities still do."""
    cfg = MTADGATConfig(**CFG, dropout=0.0)
    tcfg = TrainConfig(epochs=1, val_split=0.2, bs=8, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    # entity 1: 13 points -> 3 windows -> floor(0.2*3) = 0 val windows
    series = _series([80, 13])

    mt = MultiEntityTrainer(cfg, tcfg)
    mt.fit(series, verbose=False)

    assert len(mt.losses[0]["val_total"]) == 1
    assert np.isfinite(mt.losses[0]["val_total"][0])
    assert mt.losses[1]["val_total"] == []
    assert len(mt.losses[1]["train_total"]) == 1
    assert np.isfinite(mt.losses[1]["train_total"][0])

    # and the solo run for the empty-val entity agrees
    solo_losses, _ = _solo_losses(cfg, tcfg, series[1], tmp_path)
    assert solo_losses["val_total"] == []
    np.testing.assert_allclose(
        mt.losses[1]["train_total"], solo_losses["train_total"],
        rtol=2e-4, atol=1e-5,
    )


def test_fleet_checkpoint_resume_bit_identical(tmp_path):
    """Fleet kill-and-resume (VERDICT r3 item #3): a 3-entity fleet trained
    1 epoch + checkpointed + restored into a fresh trainer that completes
    the remaining epochs must produce trajectories and final params
    BIT-IDENTICAL to the uninterrupted 3-epoch run (the schedule-replay
    guarantee of the single-entity Trainer, now fleet-wide)."""
    import dataclasses
    import os

    cfg = MTADGATConfig(**CFG, dropout=0.2)
    tcfg = TrainConfig(epochs=3, val_split=0.2, bs=8, init_lr=1e-3,
                       log_tensorboard=False, seed=0, checkpoint_every=1)
    series = _series([80, 46, 64])

    # uninterrupted run
    full = MultiEntityTrainer(cfg, tcfg)
    full.fit(series, verbose=False)

    # interrupted: 1 epoch, checkpoint, process "dies"
    ck = str(tmp_path / "fleet")
    t1 = MultiEntityTrainer(
        cfg, dataclasses.replace(tcfg, epochs=1), save_path=ck
    )
    t1.fit(series, verbose=False)
    ckpt = os.path.join(ck, MultiEntityTrainer.FLEET_STATE_FILE)
    assert os.path.exists(ckpt)

    # fresh trainer resumes and finishes epochs 2-3
    t2 = MultiEntityTrainer(cfg, tcfg, save_path=ck)
    t2.load_fleet(ckpt, len(series))
    t2.fit(series, verbose=False)

    for e in range(len(series)):
        # resumed run records only epochs 2-3; must equal the full run's tail
        for key in full.losses[e]:
            n = len(t2.losses[e][key])
            assert t2.losses[e][key] == full.losses[e][key][-n:] if n else True
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            t2.entity_params(e), full.entity_params(e),
        )
    np.testing.assert_array_equal(np.asarray(t2.steps), np.asarray(full.steps))
