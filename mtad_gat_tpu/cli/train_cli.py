"""Full train -> evaluate -> predict pipeline entry point.

Capabilities of reference ``train.py:12-172``: loads the dataset, builds the
model, trains with a val split, plots loss curves, evaluates on test, resolves
per-dataset POT/epsilon params, runs anomaly prediction with all three
thresholding methods, and persists ``config.txt`` for later ``predict.py``
reloads. Run directories are datetime-stamped exactly like the reference
(``train.py:14``: ddmmYYYY_HHMMSS).
"""

from __future__ import annotations

import os
from datetime import datetime

from mtad_gat_tpu.cli.args import get_parser, to_run_config
from mtad_gat_tpu.config import RunConfig, lookup_pot_params
from mtad_gat_tpu.data import get_data, get_target_dims
from mtad_gat_tpu.inference import Predictor
from mtad_gat_tpu.parallel import make_mesh, multihost
from mtad_gat_tpu.training import Trainer
from mtad_gat_tpu.utils.plotting import plot_losses


def run_prediction(
    model, params, cfg: RunConfig, dataset: str, group: str, target_dims,
    n_features: int, save_path: str, x_train, x_test, y_test,
    summary_file_name: str = "summary.txt",
    mesh=None,
):
    """Per-dataset POT/epsilon param lookup + Predictor + predict_anomalies
    (reference train.py:126-167) — shared by the train pipeline and both
    sweep modes so scoring behavior cannot drift between them."""
    level, q, reg_level = lookup_pot_params(dataset, group, cfg.level, cfg.q)
    predictor = Predictor(
        model, params, cfg.lookback, n_features,
        {
            "dataset": dataset,
            "target_dims": target_dims,
            "scale_scores": cfg.scale_scores,
            "level": level,
            "q": q,
            "dynamic_pot": cfg.dynamic_pot,
            "use_mov_av": cfg.use_mov_av,
            "gamma": cfg.gamma,
            "reg_level": reg_level,
            "save_path": save_path,
        },
        summary_file_name=summary_file_name,
        batch_size=cfg.bs, data_root=cfg.data_root, mesh=mesh,
    )
    label = y_test[cfg.lookback:] if y_test is not None else None
    return predictor.predict_anomalies(x_train, x_test, label)


def run_training(
    cfg: RunConfig,
    run_id: str | None = None,
    resume_from: str | None = None,
    init_from_torch: str | None = None,
) -> str:
    """Execute the full pipeline; returns the save path. ``resume_from``
    restores a full train-state checkpoint (params + optimizer state + step)
    before continuing — true resume, which the reference lacks (SURVEY.md §5).
    ``init_from_torch`` warm-starts from a reference PyTorch ``model.pt``."""
    if cfg.auto_resume and not (run_id or cfg.run_id):
        raise ValueError(
            "--auto_resume needs --run_id: without a pinned run directory a "
            "fresh datetime id is generated and there is no checkpoint to "
            "find, silently restarting from scratch"
        )
    run_id = run_id or cfg.run_id or datetime.now().strftime("%d%m%Y_%H%M%S")
    dataset = cfg.dataset
    window_size = cfg.lookback

    # Multi-chip / multi-host setup (SURVEY.md §2.7; no reference counterpart
    # — the reference is single-device, training.py:77).
    mesh = None
    if cfg.coordinator or cfg.num_processes > 0:
        multihost.initialize(
            coordinator_address=cfg.coordinator or None,
            num_processes=cfg.num_processes or None,
            process_id=cfg.process_id if cfg.process_id >= 0 else None,
        )
    if cfg.mesh_devices:
        n = None if cfg.mesh_devices < 0 else cfg.mesh_devices
        mesh = make_mesh(n, model_parallel=cfg.model_parallel or None)
        print(f"Training mesh: {dict(mesh.shape)}")

    if dataset == "SMD":
        output_path = os.path.join(cfg.output_root, "SMD", cfg.group)
        group_index, index = cfg.group[0], cfg.group[2:]
        (x_train, _), (x_test, y_test) = get_data(
            f"machine-{group_index}-{index}", data_root=cfg.data_root,
            normalize=cfg.normalize,
        )
    elif dataset in ("MSL", "SMAP"):
        output_path = os.path.join(cfg.output_root, dataset)
        (x_train, _), (x_test, y_test) = get_data(
            dataset, data_root=cfg.data_root, normalize=cfg.normalize
        )
    else:
        raise ValueError(f'Dataset "{dataset}" not available.')

    log_dir = os.path.join(output_path, "logs")
    os.makedirs(output_path, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    save_path = os.path.join(output_path, run_id)

    n_features = x_train.shape[1]
    target_dims = get_target_dims(dataset)
    if target_dims is None:
        out_dim = n_features
        print(f"Will forecast and reconstruct all {n_features} input features")
    elif isinstance(target_dims, int):
        print(f"Will forecast and reconstruct input feature: {target_dims}")
        out_dim = 1
    else:
        print(f"Will forecast and reconstruct input features: {target_dims}")
        out_dim = len(target_dims)

    # Data-driven feature topology: resolve 'knn:K' specs to an explicit
    # edge list from the (normalized) train series, persisted in config.txt
    # so predict.py rebuilds the identical graph without recomputation.
    if cfg.feature_graph.startswith("knn:") and cfg.feature_edges is None:
        from mtad_gat_tpu.graph import knn_edges_from_series, parse_graph_spec

        _, k = parse_graph_spec(cfg.feature_graph)
        src, dst = knn_edges_from_series(x_train, k)
        cfg.feature_edges = [list(src), list(dst)]
        print(f"Feature graph {cfg.feature_graph}: {len(src)} edges "
              f"(complete would be {n_features * n_features})")

    model_cfg = cfg.model_config(n_features, out_dim)
    train_cfg = cfg.train_config()
    args_summary = cfg.to_json()
    print(args_summary)

    # Long-window footguns: the reference-style defaults allocate O(n^2)
    # state that dwarfs the model at large lookbacks — warn up front rather
    # than OOM late (docs/PERFORMANCE.md "Long-window training").
    if window_size >= 2048:
        if cfg.temporal_graph.startswith("band:") and cfg.bias_storage == "full":
            gib = window_size * window_size * 4 * 3 / 2**30
            print(f"hint: lookback {window_size} with a banded temporal graph "
                  f"keeps a full ({window_size},{window_size}) score bias — "
                  f"~{gib:.1f} GiB of params+Adam state; consider "
                  f"--bias_storage band")
        if cfg.feat_gat_embed_dim is None:
            print(f"hint: feature-GAT embed dim defaults to the lookback "
                  f"({window_size}); at long windows consider "
                  f"--feat_gat_embed_dim 150 (the flagship hidden size)")

    trainer = Trainer(
        model_cfg, train_cfg, target_dims=target_dims, save_path=save_path,
        log_dir=log_dir, args_summary=args_summary, mesh=mesh,
    )
    trainer.init_state()
    auto_ckpt = os.path.join(save_path, "train_state.msgpack")
    if resume_from:
        trainer.load_full(resume_from)
        print(f"Resumed full train state from {resume_from} (step {int(trainer.state.step)})")
    elif cfg.auto_resume and os.path.exists(auto_ckpt):
        # preemption recovery: re-running with the same --run_id picks up
        # the periodic checkpoint and replays the exact remaining epochs
        trainer.load_full(auto_ckpt)
        print(f"Auto-resumed from {auto_ckpt} (step {int(trainer.state.step)})")
    elif init_from_torch:
        trainer.load_torch(init_from_torch)
        print(f"Warm-started from PyTorch checkpoint {init_from_torch}")
    trainer.fit(x_train)

    if multihost.is_primary():
        plot_losses(trainer.losses, save_path=save_path, plot=False)

    test_loss = trainer.evaluate(x_test)
    print(f"Test forecast loss: {test_loss[0]:.5f}")
    print(f"Test reconstruction loss: {test_loss[1]:.5f}")
    print(f"Test total loss: {test_loss[2]:.5f}")

    trainer.load(os.path.join(save_path, "model.msgpack"))
    run_prediction(
        trainer.model, trainer.state.params, cfg, dataset, cfg.group,
        target_dims, n_features, save_path, x_train, x_test, y_test,
        mesh=mesh,
    )

    if multihost.is_primary():
        cfg.save(os.path.join(save_path, "config.txt"))
    return save_path


def main() -> None:
    parser = get_parser()
    parser.add_argument("--resume_from", type=str, default="",
                        help="path to a train_state.msgpack to resume from")
    parser.add_argument("--init_from_torch", type=str, default="",
                        help="warm-start from a reference PyTorch model.pt")
    args = parser.parse_args()
    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", "default"))
    cfg = to_run_config(args)
    run_training(
        cfg,
        run_id=cfg.run_id or None,
        resume_from=args.resume_from or None,
        init_from_torch=args.init_from_torch or None,
    )


if __name__ == "__main__":
    main()
