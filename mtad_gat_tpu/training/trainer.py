"""Training runtime.

Capabilities of reference ``training.py:9-253`` (Trainer with fit/evaluate/
save/load, the same six loss series, per-epoch wall-time tracking) redesigned
TPU-first:

- The raw series is transferred to the device ONCE; every batch is an
  on-device gather by window start index (no per-batch host->device copies,
  unlike ``training.py:107-108``).
- An entire epoch is one jitted ``lax.scan`` over batches: gather -> forward
  -> loss -> grad -> adam update, compiled once and replayed per epoch.
- Loss matches the reference exactly: RMSE(forecast) + RMSE(recon) per batch
  (``training.py:122-124``), epoch loss = RMS of the batch RMSEs
  (``training.py:132-138``); partial final batches are handled by masking so
  the padded epoch scan is numerically identical to the reference's ragged
  loader.
- Validation split matches ``utils.py:123-150``: one initial shuffle of the
  window indices, fixed split, train indices reshuffled every epoch
  (SubsetRandomSampler resamples), validation evaluated in fixed order.
- Checkpoints save params AND optimizer state + epoch (true resume; the
  reference only saves the state_dict, and its "best val" condition at
  training.py:152-153 compares against the just-appended value so it
  effectively saves the latest epoch — we save latest too, keeping parity).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
from mtad_gat_tpu.data.windows import batched_starts, num_windows, window_batch
from mtad_gat_tpu.models import MTADGAT
from mtad_gat_tpu.parallel import multihost
from mtad_gat_tpu.parallel.sharding import use_mesh
from mtad_gat_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from mtad_gat_tpu.training.metrics import MetricsLogger


class TrainState(flax.struct.PyTreeNode):
    params: dict
    opt_state: optax.OptState
    step: jax.Array            # int32 scalar
    rng: jax.Array             # PRNG key


def masked_rmse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """sqrt(MSE) over valid windows only. mask: (b,) 1.0 for real windows."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    per_win = ((pred - target) ** 2).reshape(pred.shape[0], -1).mean(axis=1)
    w = mask / jnp.maximum(mask.sum(), 1.0)
    return jnp.sqrt((per_win * w).sum())


def make_loss_fn(model: MTADGAT, window: int, horizon: int, target_dims):
    """Batch loss = RMSE(forecast) + RMSE(recon) over one window batch
    gathered on-device from the series (reference training.py:113-124).
    Shared by the single-entity Trainer and the vmapped MultiEntityTrainer."""
    dims = None if target_dims is None else jnp.asarray(tuple(target_dims))

    def loss_fn(params, series, starts, mask, rng, deterministic):
        x, y = window_batch(series, starts, window, horizon)
        if deterministic:
            preds, recons = model.apply({"params": params}, x, deterministic=True)
        else:
            preds, recons = model.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": rng},
            )
        x_t, y_t = x, y
        if dims is not None:
            x_t = x_t[:, :, dims]
            y_t = y_t[:, :, dims]
        y_t = y_t[:, 0, :]
        f = masked_rmse(preds, y_t, mask)
        r = masked_rmse(recons, x_t, mask)
        return f + r, (f, r)

    return loss_fn


class Trainer:
    """fit / evaluate / save / load, mirroring the reference Trainer API
    surface (``training.py:83,187,231,243``) on raw series inputs."""

    def __init__(
        self,
        model_config: MTADGATConfig,
        train_config: TrainConfig,
        target_dims: Optional[Sequence[int]] = None,
        save_path: str = "",
        log_dir: str = "output/logs",
        args_summary: str = "",
        horizon: int = 1,
        mesh=None,
    ):
        self.model_config = model_config
        self.train_config = train_config
        self.model = MTADGAT(model_config)
        self.target_dims = None if target_dims is None else tuple(target_dims)
        self.save_path = save_path
        self.log_dir = log_dir
        self.horizon = horizon
        self.window = model_config.window_size
        self.mesh = mesh  # optional jax.sharding.Mesh for multi-chip training
        self.tx = self._make_optimizer(train_config)

        self.losses = {
            "train_total": [],
            "train_forecast": [],
            "train_recon": [],
            "val_total": [],
            "val_forecast": [],
            "val_recon": [],
        }
        self.epoch_times = []
        self.state: Optional[TrainState] = None
        # step count restored by load_full(): the next fit() resumes from
        # it; 0 = nothing to resume (fresh trainer, or fit() already ran)
        self._resume_step = 0
        # Multi-process write hygiene: only process 0 writes metrics (and
        # checkpoints, see save()) — on a pod every process runs fit() but
        # the run directory must have exactly one writer.
        self.logger = MetricsLogger(
            log_dir, use_tensorboard=train_config.log_tensorboard,
            args_summary=args_summary, enabled=multihost.is_primary(),
        )

        self._build_steps()

    # ------------------------------------------------------------------
    @staticmethod
    def _make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
        """Adam matching the reference's torch defaults (train.py:92), with
        optional production extensions: global-norm clipping and cosine /
        warmup-cosine schedules (all off by default)."""
        if cfg.lr_schedule == "constant":
            lr = cfg.init_lr
        elif cfg.lr_schedule == "cosine":
            lr = optax.cosine_decay_schedule(cfg.init_lr, cfg.lr_decay_steps)
        elif cfg.lr_schedule == "warmup_cosine":
            lr = optax.warmup_cosine_decay_schedule(
                0.0, cfg.init_lr, cfg.lr_warmup_steps, cfg.lr_decay_steps
            )
        else:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule}")
        parts = []
        if cfg.grad_clip_norm is not None:
            parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
        parts.append(optax.adam(lr))
        return optax.chain(*parts)

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.train_config.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        pkey, rkey = jax.random.split(key)
        dummy = jnp.zeros(
            (1, self.window, self.model_config.n_features), jnp.float32
        )
        variables = self.model.init(pkey, dummy, deterministic=True)
        params = variables["params"]
        opt_state = self.tx.init(params)
        self.state = TrainState(
            params=params, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32), rng=rkey,
        )
        return self.state

    def _build_steps(self) -> None:
        loss_fn = make_loss_fn(
            self.model, self.window, self.horizon, self.target_dims
        )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_train(state: TrainState, series, starts, mask):
            def step(carry: TrainState, xs):
                st, m = xs
                rng = jax.random.fold_in(carry.rng, carry.step)
                (_, (f, r)), grads = grad_fn(
                    carry.params, series, st, m, rng, False
                )
                updates, opt_state = self.tx.update(
                    grads, carry.opt_state, carry.params
                )
                params = optax.apply_updates(carry.params, updates)
                new = carry.replace(
                    params=params, opt_state=opt_state, step=carry.step + 1
                )
                return new, (f, r)

            return jax.lax.scan(step, state, (starts, mask))

        @jax.jit
        def epoch_eval(params, series, starts, mask):
            def step(_, xs):
                st, m = xs
                _, (f, r) = loss_fn(params, series, st, m, None, True)
                return None, (f, r)

            _, out = jax.lax.scan(step, None, (starts, mask))
            return out

        # Entering the mesh context at call time means the constraints inside
        # the model become GSPMD anchors when the function is traced/compiled.
        # Epoch index arrays go through multihost.epoch_arrays first: a no-op
        # single-process, per-host column blocks assembled into one global
        # array on a pod slice.
        def run_train(state, series, starts, mask):
            starts, mask = multihost.epoch_arrays(self.mesh, starts, mask)
            with use_mesh(self.mesh):
                return epoch_train(state, series, starts, mask)

        def run_eval(params, series, starts, mask):
            starts, mask = multihost.epoch_arrays(self.mesh, starts, mask)
            with use_mesh(self.mesh):
                return epoch_eval(params, series, starts, mask)

        self._epoch_train = run_train
        self._epoch_eval = run_eval
        # raw jitted callables, exposed for AOT introspection (lower() ->
        # compile() -> memory_analysis(); used by bench_long.py to report
        # peak HBM — device.memory_stats() is unavailable on the remote
        # axon platform)
        self._jit_epoch_train = epoch_train
        self._jit_epoch_eval = epoch_eval

    # ------------------------------------------------------------------
    @staticmethod
    def _aggregate(f_losses: np.ndarray, r_losses: np.ndarray) -> Tuple[float, float, float]:
        """Epoch loss = RMS of batch RMSEs (reference training.py:132-138)."""
        f = float(np.sqrt((np.asarray(f_losses) ** 2).mean()))
        r = float(np.sqrt((np.asarray(r_losses) ** 2).mean()))
        return f, r, f + r

    def evaluate(self, series: np.ndarray) -> Tuple[float, float, float]:
        """Forecast/recon/total loss over all windows of a series, unshuffled
        (reference training.py:187-229)."""
        assert self.state is not None, "call init_state() first"
        series = jnp.asarray(series, jnp.float32)
        n = num_windows(series.shape[0], self.window, self.horizon)
        if n < 1:
            raise ValueError(
                f"series of length {series.shape[0]} yields no windows at "
                f"window={self.window}, horizon={self.horizon}"
            )
        starts, mask, _ = batched_starts(n, self.train_config.bs)
        fs, rs = self._epoch_eval(self.state.params, series, starts, mask)
        return self._aggregate(np.asarray(fs), np.asarray(rs))

    def _eval_indices(self, series, indices) -> Tuple[float, float, float]:
        starts, mask, _ = batched_starts(0, self.train_config.bs, indices=indices)
        fs, rs = self._epoch_eval(self.state.params, series, starts, mask)
        return self._aggregate(np.asarray(fs), np.asarray(rs))

    # ------------------------------------------------------------------
    def fit(self, train_series: np.ndarray) -> None:
        """Train for train_config.epochs with an internal train/val window
        split (reference train.py:67-72 + training.py:83-185)."""
        cfg = self.train_config
        if self.state is None:
            self.init_state()

        series = jnp.asarray(train_series, jnp.float32)
        n_win = num_windows(series.shape[0], self.window, self.horizon)
        if n_win < 1:
            # an all-padding epoch would train on nothing — worse, the
            # masked-RMSE gradient at an all-zero mask is NaN (sqrt'(0)
            # times 0) and would silently destroy the params while the
            # printed loss reads 0.0; fail loudly instead
            raise ValueError(
                f"series of length {series.shape[0]} yields no training "
                f"windows at window={self.window}, horizon={self.horizon}"
            )

        # Initial shuffle + split (utils.py:123-150)
        host_rng = np.random.default_rng(cfg.seed)
        indices = np.arange(n_win)
        if cfg.val_split > 0.0:
            split = int(np.floor(cfg.val_split * n_win))
            if cfg.shuffle_dataset:
                host_rng.shuffle(indices)
            train_idx, val_idx = indices[split:], indices[:split]
        else:
            train_idx, val_idx = indices, None

        # Resume accounting first: restarts skip the init evals too (they are
        # diagnostics and do not consume host_rng, so exactness is unaffected).
        # Only a state RESTORED from disk (load_full/auto-resume) skips
        # epochs — step alone cannot tell a restart from a second fit() on
        # an already-trained trainer (continued training, reference
        # semantics: every fit() call runs cfg.epochs epochs). n_batches
        # comes from batched_starts, the same batching the epoch scan runs.
        _, _, n_batches = batched_starts(0, cfg.bs, indices=train_idx)
        start_epoch = min(cfg.epochs, self._resume_step // n_batches)
        self._resume_step = 0  # consumed: a later fit() trains from epoch 0

        if start_epoch == 0:
            init_train = self._eval_indices(series, np.sort(train_idx))
            print(f"Init total train loss: {init_train[2]:.5f}")
            if val_idx is not None and len(val_idx):
                init_val = self._eval_indices(series, np.sort(val_idx))
                print(f"Init total val loss: {init_val[2]:.5f}")

        # A restored train_state carries the global step; completed epochs
        # are skipped while still drawing the per-epoch shuffle from
        # host_rng, so a resumed run replays the EXACT remaining schedule
        # (bit-identical to the uninterrupted run — tested).
        if start_epoch:
            print(f"Resuming at epoch {start_epoch + 1}/{cfg.epochs} "
                  f"(step {int(self.state.step)})")
        # profile the first steady (post-compile) epoch that will actually
        # execute; with a single epoch there is no post-compile one, so take
        # what exists rather than silently capturing nothing
        profile_epoch = min(start_epoch + 1, cfg.epochs - 1)

        print(f"Training model for {cfg.epochs} epochs..")
        train_start = time.time()
        for epoch in range(cfg.epochs):
            epoch_start = time.time()
            order = host_rng.permutation(train_idx) if cfg.shuffle_dataset else train_idx
            if epoch < start_epoch:
                continue  # already trained before the restart; rng stream advanced
            starts, mask, _ = batched_starts(0, cfg.bs, indices=order)
            if cfg.profile_dir and epoch == profile_epoch:
                from mtad_gat_tpu.utils.profiling import trace

                with trace(cfg.profile_dir):
                    self.state, (fs, rs) = self._epoch_train(
                        self.state, series, starts, mask
                    )
                    np.asarray(fs)  # force completion inside the trace
            else:
                self.state, (fs, rs) = self._epoch_train(self.state, series, starts, mask)
            f, r, total = self._aggregate(np.asarray(fs), np.asarray(rs))

            self.losses["train_forecast"].append(f)
            self.losses["train_recon"].append(r)
            self.losses["train_total"].append(total)
            scalars = {"train_forecast": f, "train_recon": r, "train_total": total}

            val_str = ""
            if val_idx is not None and len(val_idx):
                vf, vr, vt = self._eval_indices(series, np.sort(val_idx))
                self.losses["val_forecast"].append(vf)
                self.losses["val_recon"].append(vr)
                self.losses["val_total"].append(vt)
                scalars.update({"val_forecast": vf, "val_recon": vr, "val_total": vt})
                # reference saves every epoch (its best-val condition at
                # training.py:152-153 is vacuously true) -> save latest
                if self.save_path:
                    self.save("model.msgpack")
            elif (
                self.save_path
                and cfg.checkpoint_every
                and (epoch + 1) % cfg.checkpoint_every == 0
            ):
                # no val split: still write the full-resume train_state
                # periodically so a killed run can resume (reference loses
                # everything until its single end-of-training save)
                self.save("model.msgpack")

            self.logger.log(epoch, scalars)
            epoch_time = time.time() - epoch_start
            self.epoch_times.append(epoch_time)

            if epoch % cfg.print_every == 0:
                s = (
                    f"[Epoch {epoch + 1}] forecast_loss = {f:.5f}, "
                    f"recon_loss = {r:.5f}, total_loss = {total:.5f}"
                )
                if val_idx is not None and len(val_idx):
                    s += (
                        f" ---- val_forecast_loss = {scalars['val_forecast']:.5f}, "
                        f"val_recon_loss = {scalars['val_recon']:.5f}, "
                        f"val_total_loss = {scalars['val_total']:.5f}"
                    )
                s += f" [{epoch_time:.1f}s]"
                print(s)

        if (val_idx is None or not len(val_idx)) and self.save_path:
            self.save("model.msgpack")

        train_time = int(time.time() - train_start)
        self.logger.text("total_train_time", str(train_time))
        print(f"-- Training done in {train_time}s.")

    # ------------------------------------------------------------------
    def save(self, file_name: str) -> None:
        assert self.state is not None
        if not multihost.is_primary():
            # params are replicated across processes (same seeded init, same
            # collective updates): process 0's write is the whole checkpoint
            return
        os.makedirs(self.save_path or ".", exist_ok=True)
        path = os.path.join(self.save_path, file_name)
        save_checkpoint(path, {"params": self.state.params})
        # full-resume checkpoint alongside
        save_checkpoint(
            os.path.join(self.save_path, "train_state.msgpack"),
            {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "rng": self.state.rng,
            },
        )

    def load(self, path: str) -> None:
        if self.state is None:
            self.init_state()
        restored = load_checkpoint(path, {"params": self.state.params})
        self.state = self.state.replace(params=restored["params"])

    def load_torch(self, path: str) -> None:
        """Import a reference PyTorch ``model.pt`` checkpoint (reference
        ``training.py:231-241``) as this trainer's parameters — the migration
        path for users bringing trained reference models. Shapes are validated
        against the model's own init tree so an architecture mismatch fails
        loudly instead of mis-applying."""
        from mtad_gat_tpu.utils.torch_import import load_torch_checkpoint

        if self.state is None:
            self.init_state()
        imported = load_torch_checkpoint(path)

        ref_paths = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(self.state.params)
        }
        got_paths = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(imported)
        }
        if ref_paths != got_paths:
            missing = sorted(set(ref_paths) - set(got_paths))
            extra = sorted(set(got_paths) - set(ref_paths))
            mism = sorted(
                k for k in set(ref_paths) & set(got_paths)
                if ref_paths[k] != got_paths[k]
            )
            raise ValueError(
                f"torch checkpoint {path} does not match this model: "
                f"missing={missing} extra={extra} shape-mismatch={mism}"
            )
        params = jax.tree_util.tree_map(jnp.asarray, imported)
        self.state = self.state.replace(params=params)

    def load_full(self, path: str) -> None:
        """True resume: params + optimizer state + step + rng."""
        if self.state is None:
            self.init_state()
        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "rng": self.state.rng,
        }
        restored = load_checkpoint(path, target)
        self.state = TrainState(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"], rng=restored["rng"],
        )
        # the next fit() derives its resume point from THIS restored step
        # (not from state.step, which also grows during in-process training)
        self._resume_step = int(self.state.step)
