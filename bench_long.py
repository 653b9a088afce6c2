#!/usr/bin/env python
"""Benchmark: long-window training on real TPU hardware (VERDICT r3 item #1).

Trains the flagship 38-feature model at lookback 1024 / 4096 / 8192 with a
banded temporal graph (the O(1)-program-size block-scan attention path,
graph/ops.py:banded_attention_scan) and banded bias storage, measuring
steady-state windows/s, timesteps/s (windows/s x window — the
window-length-normalized unit that is comparable across lookbacks), and peak
HBM in use.

The reference CANNOT run this regime at any speed: its temporal attention
materializes a (b, n, n, 2k) concat tensor (`/root/reference/modules.py:174,
195-217`) — at n=8192, k=38, bs=8 that is ~163 TB. The banded-dense scan
path does O(n*(W+B)) work with no O(n^2) tensor, and bias_storage='band'
keeps the score-bias parameter at O(n*W) instead of an O(n^2) matrix that
alone would cost 256 MB params + 512 MB Adam state at n=8192.

Each configuration prints one JSON line; run on the real chip via
`python bench_long.py`. Results are recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# (lookback, band W, batch size, batches per timed epoch)
CONFIGS = [
    (1024, 128, 64, 8),
    (4096, 128, 16, 4),
    (8192, 256, 8, 4),
]


def peak_hbm_bytes(trainer, state, series, starts, mask) -> int:
    """Compiler-reported peak HBM of the jitted epoch (args + temps at the
    high-water mark). ``device.memory_stats()`` is unavailable through the
    remote axon platform, so use XLA's AOT buffer-assignment analysis."""
    try:
        ma = (
            trainer._jit_epoch_train.lower(state, series, starts, mask)
            .compile()
            .memory_analysis()
        )
        peak = int(getattr(ma, "peak_memory_in_bytes", 0) or 0)
        if peak:
            return peak
        return int(ma.argument_size_in_bytes + ma.temp_size_in_bytes
                   + ma.output_size_in_bytes)
    except Exception:
        return 0


def bench_config(lookback: int, band: int, bs: int, batches: int,
                 epochs: int = 2, dtype: str = "bfloat16",
                 gru_impl: str = "auto", gru_unroll: int = 4) -> dict:
    import tempfile

    import jax.numpy as jnp

    from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
    from mtad_gat_tpu.data.windows import batched_starts
    from mtad_gat_tpu.training import Trainer

    cfg = MTADGATConfig(
        n_features=38, window_size=lookback, out_dim=38, kernel_size=7,
        use_gatv2=True, gru_hid_dim=150, forecast_n_layers=3,
        forecast_hid_dim=150, recon_n_layers=1, recon_hid_dim=150,
        dropout=0.3, alpha=0.2, compute_dtype=dtype,
        gru_impl=gru_impl, gru_unroll=gru_unroll,
        temporal_graph=f"band:{band}", bias_storage="band",
        # the reference defaults feat embed to the window size — a (2*8192,
        # 16384) projection; long windows pin it to the flagship 150 instead
        feat_gat_embed_dim=150,
    )
    tcfg = TrainConfig(epochs=1, val_split=0.0, bs=bs, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    n_windows = batches * bs
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, tcfg, save_path="", log_dir=tmp)
        state = trainer.init_state()
        rng = np.random.default_rng(0)
        series = jnp.asarray(
            rng.standard_normal((n_windows + lookback + 8, 38)), jnp.float32
        )
        starts, mask, _ = batched_starts(n_windows, bs)
        t0 = time.perf_counter()
        state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])          # host fetch = reliable completion barrier
        compile_s = time.perf_counter() - t0
        hbm = peak_hbm_bytes(trainer, state, series, starts, mask)
        t0 = time.perf_counter()
        for _ in range(epochs):
            state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])
        dt = time.perf_counter() - t0
    wps = epochs * n_windows / dt
    return {
        "metric": "longwindow_train_windows_per_sec",
        "lookback": lookback,
        "band": band,
        "bs": bs,
        "gru_impl": gru_impl,
        "gru_unroll": gru_unroll,
        "value": round(wps, 2),
        "timesteps_per_sec": round(wps * lookback),
        "unit": "windows/s",
        "dtype": dtype,
        "first_epoch_s": round(compile_s, 1),
        "peak_hbm_gib": round(hbm / 2**30, 2),
    }


def main() -> None:
    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache("default")
    argv = sys.argv[1:]
    gru_sweep = "--gru" in argv
    only = [int(a) for a in argv if a != "--gru"] or None
    for lookback, band, bs, batches in CONFIGS:
        if only and lookback not in only:
            continue
        if gru_sweep:
            # VERDICT r4 item #8: post-shear the two GRU chains are ~2/3 of
            # the long-window step; measure fused-vs-XLA GRU and the scan
            # unroll at each lookback to justify per-regime defaults.
            for impl, unroll in (("xla", 1), ("xla", 4), ("xla", 8),
                                 ("pallas", 4)):
                print(json.dumps(bench_config(
                    lookback, band, bs, batches,
                    gru_impl=impl, gru_unroll=unroll,
                )), flush=True)
        else:
            print(json.dumps(bench_config(lookback, band, bs, batches)), flush=True)


if __name__ == "__main__":
    main()
