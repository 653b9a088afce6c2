"""Standalone inference entry point.

Capabilities of reference ``predict.py:10-173``: resolve a trained run
directory by datetime id or ``-N`` (N-th latest), reload its ``config.txt``,
validate the dataset/group matches, rebuild the model and load weights, and
run ``predict_anomalies`` writing a numbered ``summary_{n}.txt``.
"""

from __future__ import annotations

import os
from datetime import datetime

from mtad_gat_tpu.cli.args import get_parser, str2bool
from mtad_gat_tpu.config import RunConfig, lookup_pot_params
from mtad_gat_tpu.data import get_data, get_target_dims
from mtad_gat_tpu.inference import Predictor
from mtad_gat_tpu.training import Trainer


def resolve_model_dir(output_path: str, model_id: str) -> str:
    """Datetime-sorted resolution (reference ``predict.py:21-34``):
    ``--model_id -1`` = latest run, ``-2`` = second latest, else literal id.
    Runs pinned with a custom ``--run_id`` (a TPU extension the reference
    lacks) sort by directory mtime instead of crashing the datetime parse."""
    if model_id.startswith("-"):
        dir_content = os.listdir(output_path)
        subfolders = [
            s for s in dir_content
            if os.path.isdir(os.path.join(output_path, s)) and s != "logs"
        ]

        def run_time(s: str) -> datetime:
            try:
                return datetime.strptime(s, "%d%m%Y_%H%M%S")
            except ValueError:
                return datetime.fromtimestamp(
                    os.path.getmtime(os.path.join(output_path, s))
                )

        subfolders.sort(key=run_time)
        model_id = subfolders[int(model_id)]
    return os.path.join(output_path, model_id)


def main() -> None:
    parser = get_parser()
    parser.add_argument("--model_id", type=str, default="-1",
                        help="datetime run id, or -N for the N-th latest run")
    parser.add_argument("--load_scores", type=str2bool, default=False)
    parser.add_argument("--save_output", type=str2bool, default=True)
    parser.add_argument("--torch_ckpt", type=str, default="",
                        help="import a reference PyTorch model.pt instead of "
                             "the run's model.msgpack (migration path)")
    args = parser.parse_args()
    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", "default"))

    dataset = args.dataset
    if dataset == "SMD":
        output_path = os.path.join(args.output_root, "SMD", args.group)
    else:
        output_path = os.path.join(args.output_root, dataset)
    model_path = resolve_model_dir(output_path, args.model_id)
    if not os.path.isdir(model_path):
        raise FileNotFoundError(f"model path {model_path} does not exist")

    # Reload the training-time config (predict.py:49-55)
    cfg = RunConfig.load(os.path.join(model_path, "config.txt"))
    if cfg.dataset != dataset or (dataset == "SMD" and cfg.group != args.group):
        raise ValueError(
            f"model at {model_path} was trained on {cfg.dataset}/{cfg.group}, "
            f"requested {dataset}/{args.group}"
        )

    window_size = cfg.lookback
    if dataset == "SMD":
        (x_train, _), (x_test, y_test) = get_data(
            f"machine-{cfg.group[0]}-{cfg.group[2:]}", data_root=args.data_root,
            normalize=cfg.normalize,
        )
    else:
        (x_train, _), (x_test, y_test) = get_data(
            dataset, data_root=args.data_root, normalize=cfg.normalize
        )

    n_features = x_train.shape[1]
    target_dims = get_target_dims(dataset)
    out_dim = n_features if target_dims is None else len(target_dims)

    model_cfg = cfg.model_config(n_features, out_dim)
    trainer = Trainer(model_cfg, cfg.train_config(), target_dims=target_dims,
                      save_path=model_path, log_dir=os.path.join(model_path, "logs"))
    msgpack_path = os.path.join(model_path, "model.msgpack")
    torch_path = args.torch_ckpt or os.path.join(model_path, "model.pt")
    if args.torch_ckpt or (
        not os.path.exists(msgpack_path) and os.path.exists(torch_path)
    ):
        # a reference-trained run directory (or explicit torch checkpoint):
        # import the torch weights (utils/torch_import.py)
        print(f"Importing PyTorch checkpoint {torch_path}")
        trainer.load_torch(torch_path)
    else:
        trainer.load(msgpack_path)

    level, q, reg_level = lookup_pot_params(dataset, args.group, args.level, args.q)

    # numbered summary files (predict.py:160-167)
    count = 0
    summary_name = "summary.txt"
    while os.path.exists(os.path.join(model_path, summary_name)):
        count += 1
        summary_name = f"summary_{count}.txt"

    prediction_args = {
        "dataset": dataset,
        "target_dims": target_dims,
        "scale_scores": args.scale_scores,
        "level": level,
        "q": q,
        "dynamic_pot": args.dynamic_pot,
        "use_mov_av": args.use_mov_av,
        "gamma": args.gamma,
        "reg_level": reg_level,
        "save_path": model_path,
    }
    # Multi-chip scoring: --mesh_devices reaches standalone predict the same
    # way it reaches training (scoring scan sharded via GSPMD anchors)
    mesh = None
    if getattr(args, "mesh_devices", 0):
        from mtad_gat_tpu.parallel import make_mesh

        n = None if args.mesh_devices < 0 else args.mesh_devices
        mesh = make_mesh(n, model_parallel=args.model_parallel or None)
        print(f"Scoring mesh: {dict(mesh.shape)}")

    predictor = Predictor(
        trainer.model, trainer.state.params, window_size, n_features,
        prediction_args, summary_file_name=summary_name, batch_size=cfg.bs,
        data_root=args.data_root, mesh=mesh,
    )
    label = y_test[window_size:] if y_test is not None else None
    predictor.predict_anomalies(
        x_train, x_test, label,
        load_scores=args.load_scores, save_output=args.save_output,
    )


if __name__ == "__main__":
    main()
