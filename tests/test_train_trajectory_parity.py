"""Training-trajectory parity: starting from IDENTICAL weights and batches,
our jitted train loop (RMSE losses + optax adam) must track a torch loop
with the reference's exact loss formula (training.py:122-124) and torch Adam
step-for-step. This pins loss wiring, gradients, and optimizer semantics in
one test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from tests.conftest import requires_reference
from tests import torch_ref

from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
from mtad_gat_tpu.data.windows import batched_starts
from mtad_gat_tpu.training import Trainer

K, W, BS = 5, 12, 16


@requires_reference
def test_lockstep_training():
    mg = torch_ref.ref_model()
    tmodel = mg.MTAD_GAT(
        n_features=K, window_size=W, out_dim=K, kernel_size=7,
        use_gatv2=True, gru_n_layers=1, gru_hid_dim=16,
        forecast_n_layers=1, forecast_hid_dim=16, recon_n_layers=1,
        recon_hid_dim=16, dropout=0.0, alpha=0.2,
    )
    tmodel.train()

    cfg = MTADGATConfig(
        n_features=K, window_size=W, out_dim=K, kernel_size=7,
        use_gatv2=True, gru_n_layers=1, gru_hid_dim=16,
        forecast_n_layers=1, forecast_hid_dim=16, recon_n_layers=1,
        recon_hid_dim=16, dropout=0.0, alpha=0.2,
    )
    tcfg = TrainConfig(epochs=1, val_split=0.0, bs=BS, init_lr=1e-3,
                       log_tensorboard=False)
    trainer = Trainer(cfg, tcfg, log_dir="/tmp/lockstep_logs")
    trainer.init_state()
    # copy torch weights into our params
    mapped = torch_ref.map_full_model(tmodel, 1, 1)
    trainer.state = trainer.state.replace(
        params=jax.tree.map(jnp.asarray, mapped)
    )

    rng = np.random.default_rng(0)
    series = rng.standard_normal((200, K)).astype(np.float32)
    n_steps = 10
    starts_np = rng.integers(0, 200 - W - 1, size=(n_steps, BS)).astype(np.int32)

    # --- ours: one scan over the fixed batches ---
    starts = jnp.asarray(starts_np)
    mask = jnp.ones((n_steps, BS), jnp.float32)
    state, (f_ours, r_ours) = trainer._epoch_train(
        trainer.state, jnp.asarray(series), starts, mask
    )
    f_ours, r_ours = np.asarray(f_ours), np.asarray(r_ours)

    # --- torch: reference loss formula + Adam, same batches ---
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
    mse = torch.nn.MSELoss()
    f_ref, r_ref = [], []
    for step in range(n_steps):
        idx = starts_np[step]
        x = torch.from_numpy(np.stack([series[i : i + W] for i in idx]))
        y = torch.from_numpy(np.stack([series[i + W] for i in idx]))
        opt.zero_grad()
        preds, recons = tmodel(x)
        forecast_loss = torch.sqrt(mse(y, preds))
        recon_loss = torch.sqrt(mse(x, recons))
        (forecast_loss + recon_loss).backward()
        opt.step()
        f_ref.append(float(forecast_loss))
        r_ref.append(float(recon_loss))

    np.testing.assert_allclose(f_ours, f_ref, atol=2e-4)
    np.testing.assert_allclose(r_ours, r_ref, atol=2e-4)
    # the last step must still agree, i.e. optimizer states did not drift
    assert abs(f_ours[-1] - f_ref[-1]) < 2e-4
