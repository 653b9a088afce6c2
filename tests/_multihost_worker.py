"""Worker for the REAL multi-process integration test (no mocks).

Launched by ``test_multihost_real.py`` as N actual OS processes. Each process
forces a private CPU device farm, joins the jax.distributed process group via
``multihost.initialize`` (a localhost coordinator), builds the GLOBAL mesh
spanning every process's devices, and runs ``Trainer.fit`` — exercising the
``epoch_arrays`` / ``make_array_from_process_local_data`` per-host
data-feeding path for real. Process 0's losses are written to ``out_path`` so
the launcher can compare against a single-process run of the same schedule.

Usage: python _multihost_worker.py <coord> <nproc> <pid> <local_devices> <out>
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coord, nproc, pid, local_devices, out_path = sys.argv[1:6]
    nproc, pid, local_devices = int(nproc), int(pid), int(local_devices)

    # Pin the platform and per-process device count BEFORE any backend
    # initializes. The environment's sitecustomize imports jax at interpreter
    # startup (registering the TPU plugin), so the env var alone is too late
    # — update the live config too, exactly like tests/conftest.py.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mtad_gat_tpu.parallel import make_mesh, multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, (
        f"expected {nproc} processes, got {jax.process_count()}"
    )
    assert len(jax.local_devices()) == local_devices
    devices = jax.devices()  # GLOBAL device list across all processes
    assert len(devices) == nproc * local_devices

    import numpy as np

    from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
    from mtad_gat_tpu.training import Trainer

    cfg = MTADGATConfig(
        n_features=6, window_size=12, out_dim=6, kernel_size=7,
        gru_hid_dim=12, forecast_hid_dim=12, forecast_n_layers=1,
        recon_hid_dim=12, recon_n_layers=1, dropout=0.1,
    )
    tcfg = TrainConfig(
        epochs=2, val_split=0.25, bs=8, init_lr=1e-3,
        log_tensorboard=False, seed=0,
    )
    mesh = make_mesh(len(devices), devices=devices)

    rng = np.random.default_rng(0)  # same data on every process
    series = rng.standard_normal((150, 6)).astype(np.float32)

    # REAL run directory shared by every process (multi-process write
    # hygiene: checkpoints/metrics must end up written exactly once, by
    # process 0 — trainer.save / MetricsLogger gate on multihost.is_primary)
    run_dir = f"{out_path}_run"
    os.makedirs(run_dir, exist_ok=True)
    trainer = Trainer(cfg, tcfg, save_path=run_dir, log_dir=run_dir, mesh=mesh)
    trainer.init_state()
    trainer.fit(series)

    # sequence-parallel banded attention across REAL process boundaries:
    # the W-row halo ppermutes cross the jax.distributed process group
    # (parallel/banded_halo.py); deterministic so losses compare exactly
    import dataclasses
    import tempfile

    halo_cfg = dataclasses.replace(
        cfg, temporal_graph="band:3", bias_storage="band",
        attention_impl="ring", dropout=0.0,
    )
    with tempfile.TemporaryDirectory() as tmp:
        halo_trainer = Trainer(halo_cfg, tcfg, save_path="", log_dir=tmp,
                               mesh=mesh)
        halo_trainer.init_state()
        halo_trainer.fit(series)

    with open(f"{out_path}.p{pid}", "w") as f:
        json.dump({"losses": trainer.losses, "mesh": dict(mesh.shape),
                   "halo_losses": halo_trainer.losses,
                   "process_count": jax.process_count(),
                   "is_primary": multihost.is_primary(),
                   "run_dir_files": sorted(os.listdir(run_dir))}, f)


if __name__ == "__main__":
    main()
