"""All-entities sweep: train + evaluate every SMD machine (or a subset) and
aggregate the summaries.

Replaces reference ``bash_scripts/train_smd.sh`` (28 sequential
``python train.py`` invocations, 10 epochs each) with a single process that
reuses the compiled train step across entities of identical shape — the
(window, batch, features) shapes are the same for every SMD machine, so XLA
compiles once and the remaining 27 entities pay zero compile time.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from mtad_gat_tpu.cli.args import get_parser, to_run_config
from mtad_gat_tpu.config import RunConfig


def discover_smd_entities(data_root: str) -> List[str]:
    proc = os.path.join(data_root, "ServerMachineDataset", "processed")
    if not os.path.isdir(proc):
        return []
    groups = set()
    for f in os.listdir(proc):
        if f.startswith("machine-") and f.endswith("_train.pkl"):
            groups.add(f[len("machine-") : -len("_train.pkl")])
    return sorted(groups)


def run_sweep(cfg: RunConfig, groups: Optional[List[str]] = None) -> Dict[str, Dict]:
    from mtad_gat_tpu.cli.train_cli import run_training

    groups = groups or discover_smd_entities(cfg.data_root)
    if not groups:
        raise FileNotFoundError(
            f"no processed SMD entities under {cfg.data_root}; run preprocess first"
        )
    results = {}
    for group in groups:
        print(f"===== training machine-{group} =====")
        entity_cfg = RunConfig.from_dict({**cfg.__dict__, "group": group})
        save_path = run_training(entity_cfg)
        with open(os.path.join(save_path, "summary.txt")) as f:
            results[group] = json.load(f)

    agg = aggregate(results)
    out = os.path.join(cfg.output_root, "SMD", "sweep_summary.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"per_entity": results, "aggregate": agg}, f, indent=2)
    print(json.dumps(agg, indent=2))
    return results


def run_sweep_batched(cfg: RunConfig, groups: Optional[List[str]] = None) -> Dict[str, Dict]:
    """TPU-native sweep: ALL entities trained simultaneously in one vmapped
    jitted step (training/multi_entity.py), then scored per entity through
    the normal Predictor path. Same outputs as the sequential sweep
    (per-entity run dir with model.msgpack/config.txt/summary.txt +
    sweep_summary.json)."""
    import numpy as np

    from mtad_gat_tpu.cli.train_cli import run_prediction
    from mtad_gat_tpu.data import get_data, get_target_dims
    from mtad_gat_tpu.training import MultiEntityTrainer
    from mtad_gat_tpu.training.checkpoint import save_checkpoint

    groups = groups or discover_smd_entities(cfg.data_root)
    if not groups:
        raise FileNotFoundError(
            f"no processed SMD entities under {cfg.data_root}; run preprocess first"
        )
    data = {}
    for group in groups:
        data[group] = get_data(
            f"machine-{group}", data_root=cfg.data_root,
            normalize=cfg.normalize,
        )
    n_features = next(iter(data.values()))[0][0].shape[1]
    target_dims = get_target_dims("SMD")
    out_dim = n_features if target_dims is None else len(target_dims)

    series_list = [np.asarray(data[g][0][0], np.float32) for g in groups]

    # The vmapped fleet shares ONE static topology, so a data-driven
    # 'knn:K' feature graph is resolved from the CONCATENATED train series
    # of all entities (the fleet-level correlation structure). Per-entity
    # graphs require the sequential sweep.
    if cfg.feature_graph.startswith("knn:") and cfg.feature_edges is None:
        from mtad_gat_tpu.graph import knn_edges_from_series, parse_graph_spec

        _, k = parse_graph_spec(cfg.feature_graph)
        src, dst = knn_edges_from_series(np.concatenate(series_list, axis=0), k)
        cfg.feature_edges = [list(src), list(dst)]
        print(f"Feature graph {cfg.feature_graph} (shared across the fleet, "
              f"from concatenated train series): {len(src)} edges")

    mesh = None
    if cfg.mesh_devices:
        from mtad_gat_tpu.parallel import make_mesh

        n = None if cfg.mesh_devices < 0 else cfg.mesh_devices
        # entity axis shards over the data axis: keep the mesh 1-way on model
        mesh = make_mesh(n, model_parallel=1)
        print(f"Batched sweep mesh: {dict(mesh.shape)} (entity axis over data)")

    from datetime import datetime

    run_id = cfg.run_id or datetime.now().strftime("%d%m%Y_%H%M%S")
    # fleet-level checkpoint directory: full stacked train state written
    # every checkpoint_every epochs so a preempted sweep resumes via
    # --auto_resume --run_id <id> instead of restarting 28 entities
    fleet_dir = os.path.join(cfg.output_root, "SMD", "fleet", run_id)

    model_cfg = cfg.model_config(n_features, out_dim)
    train_cfg = cfg.train_config()
    trainer = MultiEntityTrainer(
        model_cfg, train_cfg, target_dims=target_dims, mesh=mesh,
        save_path=fleet_dir,
    )
    fleet_ckpt = os.path.join(fleet_dir, MultiEntityTrainer.FLEET_STATE_FILE)
    if cfg.auto_resume and os.path.exists(fleet_ckpt):
        trainer.load_fleet(fleet_ckpt, len(groups))
        print(f"Auto-resumed fleet from {fleet_ckpt}")
    print(f"Batched sweep: training {len(groups)} entities simultaneously")
    trainer.fit(series_list)

    results = {}
    for e, group in enumerate(groups):
        save_path = os.path.join(cfg.output_root, "SMD", group, run_id)
        os.makedirs(save_path, exist_ok=True)
        params = trainer.entity_params(e)
        save_checkpoint(os.path.join(save_path, "model.msgpack"),
                        {"params": params})
        (x_train, _), (x_test, y_test) = data[group]
        results[group] = run_prediction(
            trainer.model, params, cfg, "SMD", group, target_dims,
            n_features, save_path, x_train, x_test, y_test,
            mesh=mesh,
        )
        entity_cfg = RunConfig.from_dict({**cfg.__dict__, "group": group})
        entity_cfg.save(os.path.join(save_path, "config.txt"))

    agg = aggregate(results)
    out = os.path.join(cfg.output_root, "SMD", "sweep_summary.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"per_entity": results, "aggregate": agg}, f, indent=2)
    print(json.dumps(agg, indent=2))
    return results


def aggregate(results: Dict[str, Dict]) -> Dict[str, Dict[str, float]]:
    """Mean and micro-averaged P/R/F1 per thresholding method across entities."""
    agg = {}
    for method in ("epsilon_result", "pot_result", "bf_result"):
        f1s, tps, fps, fns = [], 0.0, 0.0, 0.0
        for res in results.values():
            r = res.get(method, {})
            if "f1" not in r:
                continue
            f1s.append(r["f1"])
            tps += r.get("TP", 0.0)
            fps += r.get("FP", 0.0)
            fns += r.get("FN", 0.0)
        if not f1s:
            continue
        micro_p = tps / (tps + fps + 1e-5)
        micro_r = tps / (tps + fns + 1e-5)
        agg[method] = {
            "mean_f1": float(np.mean(f1s)),
            "micro_precision": micro_p,
            "micro_recall": micro_r,
            "micro_f1": 2 * micro_p * micro_r / (micro_p + micro_r + 1e-5),
            "n_entities": len(f1s),
        }
    return agg


def main() -> None:
    parser = get_parser()
    parser.add_argument("--groups", type=str, default="",
                        help="comma-separated SMD groups (default: all discovered)")
    parser.add_argument("--batched", action="store_true",
                        help="train ALL entities simultaneously in one vmapped "
                             "step (multi-entity batched training) instead of "
                             "sequentially. NOTE: with --feature_graph knn:K "
                             "the fleet shares ONE graph resolved from the "
                             "concatenated train series of all entities, "
                             "whereas the sequential sweep builds a per-entity "
                             "graph — same flags, different topology")
    args = parser.parse_args()
    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", "default"))
    cfg = to_run_config(args)
    groups = [g for g in args.groups.split(",") if g] or None
    if args.batched:
        run_sweep_batched(cfg, groups)
    else:
        run_sweep(cfg, groups)


if __name__ == "__main__":
    main()
