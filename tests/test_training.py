"""Training-runtime tests: loss decreases, masking exactness, checkpoint
save/load/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.training import Trainer
from mtad_gat_tpu.training.trainer import masked_rmse


def tiny_configs(k=5, w=12, epochs=2, bs=16, val_split=0.1):
    mc = MTADGATConfig(
        n_features=k, window_size=w, out_dim=k, kernel_size=7,
        gru_hid_dim=16, forecast_hid_dim=16, forecast_n_layers=1,
        recon_hid_dim=16, recon_n_layers=1, dropout=0.1,
    )
    tc = TrainConfig(epochs=epochs, val_split=val_split, bs=bs, init_lr=1e-3,
                     log_tensorboard=False, seed=0)
    return mc, tc


def test_masked_rmse_matches_unmasked():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 4)))
    b = jnp.asarray(rng.standard_normal((8, 4)))
    full = masked_rmse(a, b, jnp.ones(8))
    want = np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    assert float(full) == pytest.approx(want, rel=1e-6)
    # padding rows must not contribute
    a_pad = jnp.concatenate([a, 100 + jnp.zeros((4, 4))])
    b_pad = jnp.concatenate([b, jnp.zeros((4, 4))])
    mask = jnp.concatenate([jnp.ones(8), jnp.zeros(4)])
    assert float(masked_rmse(a_pad, b_pad, mask)) == pytest.approx(want, rel=1e-6)


def test_fit_reduces_loss(tmp_path):
    train, _, _ = synthetic_series(n_train=400, n_test=10, n_features=5)
    mc, tc = tiny_configs(epochs=3)
    trainer = Trainer(mc, tc, save_path=str(tmp_path), log_dir=str(tmp_path / "logs"))
    trainer.init_state()
    before = trainer.evaluate(train)[2]
    trainer.fit(train)
    after = trainer.evaluate(train)[2]
    assert after < before
    assert len(trainer.losses["train_total"]) == 3
    assert len(trainer.losses["val_total"]) == 3


def test_checkpoint_roundtrip(tmp_path):
    train, _, _ = synthetic_series(n_train=300, n_test=10, n_features=5)
    mc, tc = tiny_configs(epochs=1)
    trainer = Trainer(mc, tc, save_path=str(tmp_path), log_dir=str(tmp_path / "logs"))
    trainer.init_state()
    trainer.fit(train)
    loss1 = trainer.evaluate(train)

    other = Trainer(mc, tc, save_path=str(tmp_path), log_dir=str(tmp_path / "logs2"))
    other.load(str(tmp_path / "model.msgpack"))
    loss2 = other.evaluate(train)
    assert loss1 == pytest.approx(loss2, rel=1e-6)

    # full-resume restores optimizer state and step counter
    resumed = Trainer(mc, tc, save_path=str(tmp_path), log_dir=str(tmp_path / "logs3"))
    resumed.load_full(str(tmp_path / "train_state.msgpack"))
    assert int(resumed.state.step) == int(trainer.state.step)
    chex_tree = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        resumed.state.opt_state, trainer.state.opt_state,
    )
    assert all(jax.tree.leaves(chex_tree))


def test_target_dims_slicing(tmp_path):
    train, _, _ = synthetic_series(n_train=300, n_test=10, n_features=5)
    mc, tc = tiny_configs(epochs=1)
    mc = MTADGATConfig(**{**mc.__dict__, "out_dim": 1})
    trainer = Trainer(mc, tc, target_dims=[0], save_path="",
                      log_dir=str(tmp_path / "logs"))
    trainer.init_state()
    trainer.fit(train)  # should run without shape errors
    assert np.isfinite(trainer.losses["train_total"][0])
