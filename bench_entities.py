#!/usr/bin/env python
"""Multi-entity batched-training benchmark (VERDICT r2 item #9).

Measures aggregate training throughput (windows/s summed over entities) of

  - sequential: one entity at a time through the single-entity Trainer
    (what the reference's bash sweep expresses, minus its process restarts
    and recompiles — this is the STRONGEST sequential baseline), vs
  - batched: all E entities in one vmapped jitted step
    (training/multi_entity.py),

at the flagship SMD shape (38 features, window 100, bs 256/entity, bf16).
Prints one JSON line per (mode, E). Run on the TPU: python bench_entities.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench(E: int, batches_per_epoch: int = 10, bs: int = 256, epochs: int = 3):
    import jax.numpy as jnp

    from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
    from mtad_gat_tpu.data.windows import batched_starts
    from mtad_gat_tpu.training import MultiEntityTrainer, Trainer
    import tempfile

    cfg = MTADGATConfig(
        n_features=38, window_size=100, out_dim=38, kernel_size=7,
        use_gatv2=True, gru_hid_dim=150, forecast_n_layers=3,
        forecast_hid_dim=150, recon_n_layers=1, recon_hid_dim=150,
        dropout=0.3, alpha=0.2, compute_dtype="bfloat16",
    )
    tcfg = TrainConfig(epochs=1, val_split=0.0, bs=bs, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    n_windows = batches_per_epoch * bs
    rng = np.random.default_rng(0)
    series_np = rng.standard_normal((n_windows + 200, 38)).astype(np.float32)
    starts, mask, _ = batched_starts(n_windows, bs)
    rows = []

    with tempfile.TemporaryDirectory() as tmp:
        # sequential baseline: E epochs through one compiled Trainer step
        trainer = Trainer(cfg, tcfg, save_path="", log_dir=tmp)
        state = trainer.init_state()
        series = jnp.asarray(series_np)
        state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])  # compile + completion
        t0 = time.perf_counter()
        for _ in range(epochs * E):
            state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])
        dt_seq = time.perf_counter() - t0
        seq_wps = epochs * E * n_windows / dt_seq
        rows.append({
            "metric": "sweep_windows_per_sec", "mode": "sequential",
            "entities": E, "value": round(seq_wps, 1), "unit": "windows/s",
        })
        print(json.dumps(rows[-1]))

        # batched: same total work, one vmapped step over E entities
        mt = MultiEntityTrainer(cfg, tcfg)
        mt.init_states(E)
        stacked = jnp.asarray(
            np.broadcast_to(series_np, (E,) + series_np.shape)
        )
        st = jnp.asarray(np.broadcast_to(starts[:, None], (starts.shape[0], E, bs)))
        mk = jnp.asarray(np.broadcast_to(mask[:, None], (mask.shape[0], E, bs)))
        mt.params, mt.opt_state, mt.steps, fs, _ = mt._epoch_train(
            mt.params, mt.opt_state, mt.steps, mt.rngs, stacked, st, mk
        )
        np.asarray(fs)
        t0 = time.perf_counter()
        for _ in range(epochs):
            mt.params, mt.opt_state, mt.steps, fs, _ = mt._epoch_train(
                mt.params, mt.opt_state, mt.steps, mt.rngs, stacked, st, mk
            )
        np.asarray(fs)
        dt_bat = time.perf_counter() - t0
        bat_wps = epochs * E * n_windows / dt_bat
        rows.append({
            "metric": "sweep_windows_per_sec", "mode": "batched",
            "entities": E, "value": round(bat_wps, 1), "unit": "windows/s",
            "speedup_vs_sequential": round(bat_wps / seq_wps, 2),
        })
        print(json.dumps(rows[-1]))
    return rows


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--bs", type=int, default=256, help="per-entity batch size")
    args = ap.parse_args()
    for E in args.entities:
        bench(E, batches_per_epoch=args.batches, bs=args.bs)


if __name__ == "__main__":
    main()
