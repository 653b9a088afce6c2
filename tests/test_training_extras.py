"""Production-training extensions: remat, schedules, clipping, impl
plumbing, and a learning-works end-to-end quality check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.models import MTADGAT
from mtad_gat_tpu.training import Trainer


def _cfgs(**over):
    mc = MTADGATConfig(
        n_features=5, window_size=12, out_dim=5, gru_hid_dim=16,
        forecast_hid_dim=16, forecast_n_layers=1, recon_hid_dim=16,
        recon_n_layers=1, dropout=0.1,
        **{k: v for k, v in over.items() if hasattr(MTADGATConfig, k)},
    )
    tc = TrainConfig(
        epochs=2, val_split=0.0, bs=16, init_lr=1e-3, log_tensorboard=False,
        **{k: v for k, v in over.items() if hasattr(TrainConfig, k) and not hasattr(MTADGATConfig, k)},
    )
    return mc, tc


def test_remat_matches_no_remat():
    """Rematerialization must not change values or gradients."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 12, 5)), jnp.float32)
    base = MTADGAT(MTADGATConfig(
        n_features=5, window_size=12, out_dim=5, gru_hid_dim=8,
        forecast_hid_dim=8, forecast_n_layers=1, recon_hid_dim=8,
        recon_n_layers=1, dropout=0.0,
    ))
    remat = MTADGAT(MTADGATConfig(
        n_features=5, window_size=12, out_dim=5, gru_hid_dim=8,
        forecast_hid_dim=8, forecast_n_layers=1, recon_hid_dim=8,
        recon_n_layers=1, dropout=0.0, remat_attention=True,
    ))
    params = base.init(jax.random.PRNGKey(0), x)["params"]

    def loss(model, p):
        preds, recons = model.apply({"params": p}, x, True)
        return jnp.sum(preds ** 2) + jnp.sum(recons ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(base, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("schedule", ["cosine", "warmup_cosine"])
def test_lr_schedules_train(schedule, tmp_path):
    train, _, _ = synthetic_series(n_train=200, n_test=10, n_features=5)
    mc, tc = _cfgs(lr_schedule=schedule, lr_warmup_steps=5, lr_decay_steps=50,
                   grad_clip_norm=1.0)
    trainer = Trainer(mc, tc, log_dir=str(tmp_path))
    trainer.init_state()
    trainer.fit(train)
    assert np.isfinite(trainer.losses["train_total"]).all()


def test_attention_impl_plumbing(tmp_path):
    """config.attention_impl reaches the layers: sparse == dense end-to-end."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 12, 5)), jnp.float32)
    mk = lambda impl: MTADGAT(MTADGATConfig(
        n_features=5, window_size=12, out_dim=5, gru_hid_dim=8,
        forecast_hid_dim=8, forecast_n_layers=1, recon_hid_dim=8,
        recon_n_layers=1, dropout=0.0, attention_impl=impl,
    ))
    dense, sparse = mk("dense"), mk("sparse")
    params = dense.init(jax.random.PRNGKey(0), x)
    pd, rd = dense.apply(params, x)
    ps, rs = sparse.apply(params, x)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(ps), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rs), atol=1e-5)


def test_learning_detects_synthetic_anomalies(tmp_path):
    """Full train->score->threshold on synthetic data must actually detect
    the injected anomalies (bf-search F1 well above chance)."""
    from mtad_gat_tpu.inference import Predictor

    train, test, labels = synthetic_series(
        n_train=800, n_test=400, n_features=6, anomaly_segments=3, seed=7
    )
    mc = MTADGATConfig(
        n_features=6, window_size=16, out_dim=6, gru_hid_dim=32,
        forecast_hid_dim=32, forecast_n_layers=1, recon_hid_dim=32,
        recon_n_layers=1, dropout=0.1,
    )
    tc = TrainConfig(epochs=8, val_split=0.1, bs=32, init_lr=1e-3,
                     log_tensorboard=False, seed=0)
    trainer = Trainer(mc, tc, log_dir=str(tmp_path / "logs"))
    trainer.init_state()
    trainer.fit(train)
    # training must have reduced the loss substantially
    assert trainer.losses["train_total"][-1] < 0.7 * trainer.losses["train_total"][0]

    predictor = Predictor(
        trainer.model, trainer.state.params, 16, 6,
        {
            "dataset": "SMD", "target_dims": None, "scale_scores": False,
            "q": 1e-3, "level": 0.98, "dynamic_pot": False, "use_mov_av": False,
            "gamma": 1.0, "reg_level": 1, "save_path": str(tmp_path),
        },
        batch_size=32,
    )
    summary = predictor.predict_anomalies(train, test, labels[16:], save_output=False)
    assert summary["bf_result"]["f1"] > 0.8, summary["bf_result"]


def test_periodic_checkpoint_without_val_and_resume(tmp_path):
    """checkpoint_every writes the full-resume train_state every N epochs
    even with val_split=0 (the reference only saves once at the end), and a
    fresh trainer resumes from it at the saved step."""
    mc, tc = _cfgs(checkpoint_every=1)
    series = synthetic_series(n_train=120, n_test=60, n_features=5, seed=0)[0]

    save = tmp_path / "run"
    tr = Trainer(mc, tc, save_path=str(save), log_dir=str(tmp_path / "logs"))
    tr.fit(series)
    assert (save / "train_state.msgpack").exists()
    assert (save / "model.msgpack").exists()

    tr2 = Trainer(mc, tc, save_path="", log_dir=str(tmp_path / "logs2"))
    tr2.load_full(str(save / "train_state.msgpack"))
    assert int(tr2.state.step) > 0
    # resumed state trains onward without error
    tr2.fit(series)


def test_second_fit_trains_more_epochs(tmp_path):
    """Calling fit() again on an already-trained trainer runs the full
    epoch count again (continued training, reference semantics: every
    fit() call trains cfg.epochs epochs). Only a state RESTORED from disk
    resumes mid-schedule — step alone must not be mistaken for a restart,
    or the second fit() silently trains nothing."""
    mc, tc = _cfgs()
    series = synthetic_series(n_train=120, n_test=60, n_features=5, seed=0)[0]

    tr = Trainer(mc, tc, log_dir=str(tmp_path / "logs"))
    tr.fit(series)
    step_after_first = int(tr.state.step)
    n_epoch_rows = len(tr.losses["train_total"])
    assert n_epoch_rows == tc.epochs

    tr.fit(series)  # must actually train, not "resume" past everything
    assert int(tr.state.step) == 2 * step_after_first
    assert len(tr.losses["train_total"]) == 2 * tc.epochs


def test_too_short_series_raises(tmp_path):
    """A series yielding zero windows must fail loudly: an all-padding
    epoch would apply NaN masked-RMSE gradients (sqrt'(0) * 0) while
    printing 0.0 losses, silently destroying the params."""
    mc, tc = _cfgs()
    tr = Trainer(mc, tc, log_dir=str(tmp_path / "logs"))
    short = np.zeros((mc.window_size, mc.n_features), np.float32)
    with pytest.raises(ValueError, match="no training windows"):
        tr.fit(short)
    tr.init_state()
    with pytest.raises(ValueError, match="no windows"):
        tr.evaluate(short)


def test_checkpoint_every_zero_is_reference_behavior(tmp_path):
    """checkpoint_every=0 + no val split -> nothing on disk until the final
    end-of-training save (reference training.py:179-180 semantics)."""
    mc, tc = _cfgs(checkpoint_every=0)
    import dataclasses
    tc = dataclasses.replace(tc, epochs=1)
    series = synthetic_series(n_train=120, n_test=60, n_features=5, seed=0)[0]
    save = tmp_path / "run"
    tr = Trainer(mc, tc, save_path=str(save), log_dir=str(tmp_path / "logs"))
    tr.fit(series)
    assert (save / "model.msgpack").exists()  # the single end-of-run save


def test_profile_dir_captures_trace(tmp_path):
    """profile_dir captures a jax.profiler trace of epoch 1."""
    import os

    prof = tmp_path / "prof"
    mc, tc = _cfgs(profile_dir=str(prof))
    series = synthetic_series(n_train=120, n_test=60, n_features=5, seed=0)[0]
    tr = Trainer(mc, tc, save_path="", log_dir=str(tmp_path / "logs"))
    tr.fit(series)
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs
    ]
    assert files, "no trace artifacts written"


def test_resume_is_bit_exact(tmp_path):
    """Interrupted-and-resumed training equals uninterrupted training
    exactly: the restored step count skips completed epochs while replaying
    the host shuffle stream, and the on-device dropout keys are step-derived."""
    import dataclasses

    import jax

    series = synthetic_series(n_train=140, n_test=60, n_features=5, seed=0)[0]
    mc, _ = _cfgs()
    tc3 = TrainConfig(epochs=3, val_split=0.0, bs=16, init_lr=1e-3,
                      log_tensorboard=False, seed=0, checkpoint_every=1)

    # uninterrupted: 3 epochs straight
    tr_full = Trainer(mc, tc3, save_path="", log_dir=str(tmp_path / "l1"))
    tr_full.fit(series)

    # interrupted: 1 epoch, checkpoint, then a fresh process resumes for the
    # remaining 2 (same epochs=3 config, state restored at step n_batches)
    save = tmp_path / "run"
    tc1 = dataclasses.replace(tc3, epochs=1)
    tr_a = Trainer(mc, tc1, save_path=str(save), log_dir=str(tmp_path / "l2"))
    tr_a.fit(series)

    tr_b = Trainer(mc, tc3, save_path="", log_dir=str(tmp_path / "l3"))
    tr_b.load_full(str(save / "train_state.msgpack"))
    tr_b.fit(series)

    for a, b in zip(
        jax.tree_util.tree_leaves(tr_full.state.params),
        jax.tree_util.tree_leaves(tr_b.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the loss histories line up for the resumed epochs
    assert tr_b.losses["train_total"] == tr_full.losses["train_total"][1:]


def test_compile_cache_toggle(tmp_path):
    """enable_compile_cache: explicit dir is applied to the jax config,
    empty string is a no-op, failures degrade silently (the cache is an
    optimization, never a requirement)."""
    import os

    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "xla_cache")
        enable_compile_cache(target)
        assert jax.config.jax_compilation_cache_dir == target
        assert os.path.isdir(target)

        enable_compile_cache("")      # no-op: config unchanged
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
