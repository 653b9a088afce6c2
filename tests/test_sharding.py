"""Multi-chip sharding tests on the 8-device CPU farm (the TPU-native
equivalent of a fake distributed backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
from mtad_gat_tpu.data import synthetic_series
from mtad_gat_tpu.parallel import best_mesh_shape, constrain, make_mesh, use_mesh
from mtad_gat_tpu.training import Trainer


def test_best_mesh_shape():
    assert best_mesh_shape(1) == (1, 1)
    assert best_mesh_shape(8) == (2, 4)
    assert best_mesh_shape(8, model_parallel=2) == (4, 2)
    assert best_mesh_shape(4) == (1, 4)


def test_constrain_noop_without_mesh():
    x = jnp.ones((4, 4))
    y = constrain(x, "data", None)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_constrain_applies_in_mesh():
    mesh = make_mesh(8)

    @jax.jit
    def f(x):
        with use_mesh(mesh):
            return constrain(x * 2, "data", None)

    x = jnp.ones((8, 4))
    out = f(x)
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((8, 4)))


def test_sharded_training_matches_single_device():
    """The same seed must give the same losses with and without a mesh —
    sharding is a layout decision, not a math decision."""
    assert len(jax.devices()) >= 8
    train, _, _ = synthetic_series(n_train=200, n_test=10, n_features=8)
    mc = MTADGATConfig(
        n_features=8, window_size=16, out_dim=8, gru_hid_dim=16,
        forecast_hid_dim=16, forecast_n_layers=1, recon_hid_dim=16,
        recon_n_layers=1, dropout=0.0,
    )
    tc = TrainConfig(epochs=2, val_split=0.0, bs=16, init_lr=1e-3,
                     log_tensorboard=False, seed=0)

    t1 = Trainer(mc, tc, log_dir="/tmp/shard_logs1")
    t1.init_state()
    t1.fit(train)

    mesh = make_mesh(8)
    t2 = Trainer(mc, tc, log_dir="/tmp/shard_logs2", mesh=mesh)
    t2.init_state()
    t2.fit(train)

    np.testing.assert_allclose(
        t1.losses["train_total"], t2.losses["train_total"], rtol=2e-4
    )


def test_dryrun_multichip():
    from tests.conftest import load_graft_entry

    ge = load_graft_entry()

    ge.dryrun_multichip(8)


def test_entry_compiles():
    from tests.conftest import load_graft_entry

    ge = load_graft_entry()

    fn, (params, x) = ge.entry()
    preds, recons = jax.jit(fn)(params, x)
    assert preds.shape == (8, 38)
    assert recons.shape == (8, 100, 38)
