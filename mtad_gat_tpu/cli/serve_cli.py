"""Streaming-serving entry point: score points as they arrive.

No reference counterpart — the reference scores complete series offline only
(``prediction.py:36-94``). This CLI wraps :class:`OnlineScorer` as a process:
it loads a trained run (resolved exactly like ``predict.py``), arms the
alarm threshold from the run's training scores, then reads observations from
a CSV file or stdin and emits one JSON record per scoreable point
(``{"t", "score", "threshold", "is_anomaly"}``) to stdout or a file.

Throughput modes (docs/PERFORMANCE.md "Online serving"):

- ``--chunk 1``: per-point dispatch — lowest latency (~1 ms compute; the
  rest is attach round-trip).
- ``--chunk K`` (default 128): K points per jitted ``lax.scan`` dispatch —
  measured 1,100+ points/s at chunk 512 over the remote tunnel, 31x the
  per-point rate. Records are identical either way (tested).

Usage::

    python serve.py --dataset SMD --group 1-1 --model_id -1 \
        --input stream.csv --threshold_method epsilon
    tail -f live.csv | python serve.py --dataset SMD --group 1-1 --input -
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from mtad_gat_tpu.cli.args import get_parser
from mtad_gat_tpu.cli.predict_cli import resolve_model_dir
from mtad_gat_tpu.config import RunConfig, lookup_pot_params
from mtad_gat_tpu.data import get_data, get_target_dims


def _train_scores(model_path: str, trainer, x_train, cfg, n_features,
                  target_dims) -> np.ndarray:
    """Threshold-calibration scores for the training split: reuse the run's
    cached ``train_output.pkl`` when present (written by predict/train),
    else score the series through the offline Predictor (raw scores — the
    streaming path has no scale/smoothing, see OnlineScorer docstring)."""
    cached = os.path.join(model_path, "train_output.pkl")
    if os.path.exists(cached):
        import pandas as pd

        df = pd.read_pickle(cached)
        if "A_Score_Global" in df.columns:
            print(f"Calibrating threshold from cached {cached}")
            return df["A_Score_Global"].to_numpy()
    from mtad_gat_tpu.inference import Predictor

    print("Calibrating threshold: scoring the training split..")
    predictor = Predictor(
        trainer.model, trainer.state.params, cfg.lookback, n_features,
        {
            "dataset": cfg.dataset, "target_dims": target_dims,
            "scale_scores": False, "level": None, "q": None,
            "dynamic_pot": False, "use_mov_av": False, "gamma": cfg.gamma,
            "reg_level": 1, "save_path": model_path,
        },
        batch_size=cfg.bs, data_root=cfg.data_root,
    )
    return predictor.get_score(x_train)["A_Score_Global"].to_numpy()


def _stream_chunks(source, n_features: int, chunk: int):
    """Yield (chunk, n_features) float32 arrays from a CSV stream. '-' =
    stdin (a chunk is emitted as soon as `chunk` lines are read, so piped
    live streams serve incrementally — readline() rather than iterating the
    file object, whose read-ahead buffering would delay live low-latency
    streams)."""
    fh = sys.stdin if source == "-" else open(source)
    rows = []
    try:
        for line in iter(fh.readline, ""):
            line = line.strip()
            if not line:
                continue
            vals = np.array(line.split(","), dtype=np.float32)
            if vals.size != n_features:
                raise ValueError(
                    f"stream row has {vals.size} values, model expects "
                    f"{n_features}"
                )
            rows.append(vals)
            if len(rows) >= chunk:
                yield np.stack(rows)
                rows = []
        if rows:
            yield np.stack(rows)
    finally:
        if fh is not sys.stdin:
            fh.close()


def main() -> None:
    parser = get_parser()
    parser.add_argument("--model_id", type=str, default="-1",
                        help="datetime run id, or -N for the N-th latest run")
    parser.add_argument("--input", type=str, default="-",
                        help="CSV stream of observations (one point per "
                             "line, n_features comma-separated values); "
                             "'-' = stdin")
    parser.add_argument("--output", type=str, default="-",
                        help="JSONL records destination; '-' = stdout")
    parser.add_argument("--threshold_method", type=str, default="epsilon",
                        choices=["epsilon", "spot"],
                        help="alarm: fixed Hundman epsilon from train "
                             "scores, or streaming POT (GPD tail re-fit "
                             "per peak)")
    parser.add_argument("--chunk", type=int, default=128,
                        help="points per jitted dispatch (1 = lowest "
                             "latency; larger = higher throughput)")
    args = parser.parse_args()
    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", "default"))

    dataset = args.dataset
    if dataset == "SMD":
        output_path = os.path.join(args.output_root, "SMD", args.group)
    else:
        output_path = os.path.join(args.output_root, dataset)
    model_path = resolve_model_dir(output_path, args.model_id)
    cfg = RunConfig.load(os.path.join(model_path, "config.txt"))

    entity = (
        f"machine-{cfg.group[0]}-{cfg.group[2:]}" if dataset == "SMD" else dataset
    )
    (x_train, _), _ = get_data(
        entity, data_root=args.data_root, normalize=cfg.normalize
    )
    # The model consumes NORMALIZED inputs (MinMaxScaler fit on train,
    # reference utils.py:97-99); incoming stream points are raw sensor
    # values, so refit the SAME train scaler and apply it per chunk —
    # otherwise streamed scores are on a different scale than the
    # calibration scores (found by driving the quick start end-to-end).
    scaler = None
    if cfg.normalize:
        from mtad_gat_tpu.data.loading import normalize_data

        (raw_train, _), _ = get_data(
            entity, data_root=args.data_root, normalize=False
        )
        _, scaler = normalize_data(raw_train)
    n_features = x_train.shape[1]
    target_dims = get_target_dims(dataset)
    out_dim = n_features if target_dims is None else len(target_dims)

    from mtad_gat_tpu.training import Trainer

    trainer = Trainer(
        cfg.model_config(n_features, out_dim), cfg.train_config(),
        target_dims=target_dims, save_path=model_path,
        log_dir=os.path.join(model_path, "logs"),
    )
    trainer.load(os.path.join(model_path, "model.msgpack"))

    from mtad_gat_tpu.inference import OnlineScorer

    scorer = OnlineScorer(
        trainer.model, trainer.state.params, cfg.lookback, n_features,
        target_dims=target_dims, gamma=cfg.gamma,
    )
    train_scores = _train_scores(
        model_path, trainer, x_train, cfg, n_features, target_dims
    )
    level, q, reg_level = lookup_pot_params(dataset, args.group, cfg.level, cfg.q)
    scorer.fit_threshold(
        train_scores, method=args.threshold_method,
        reg_level=reg_level, q=q, level=level,
    )

    # warm the window with the tail of the training series so the stream is
    # scoreable from its first point (the model has seen this data)
    scorer.update_many(x_train[-cfg.lookback:])
    print(f"Serving: window primed with the last {cfg.lookback} train "
          f"points; chunk={args.chunk}, threshold={args.threshold_method}",
          file=sys.stderr)

    sink = sys.stdout if args.output == "-" else open(args.output, "w")
    n_pts = n_alarms = 0
    try:
        for batch in _stream_chunks(args.input, n_features, max(1, args.chunk)):
            if scaler is not None:
                batch = np.nan_to_num(
                    np.asarray(batch, np.float32)
                )
                batch = scaler.transform(batch)
            for rec in scorer.update_many(batch):
                n_pts += 1
                n_alarms += bool(rec.get("is_anomaly"))
                sink.write(json.dumps({
                    "t": int(rec["t"]),
                    "score": float(rec["score"]),
                    "threshold": float(rec["threshold"]),
                    "is_anomaly": bool(rec["is_anomaly"]),
                }) + "\n")
            sink.flush()
    finally:
        if sink is not sys.stdout:
            sink.close()
    print(f"Served {n_pts} points, {n_alarms} alarms.", file=sys.stderr)


if __name__ == "__main__":
    main()
