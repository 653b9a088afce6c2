"""All-entities sweep: train + evaluate every SMD machine (or a subset) and
aggregate the summaries.

Replaces reference ``bash_scripts/train_smd.sh`` (28 sequential
``python train.py`` invocations, 10 epochs each) with a single process that
reuses the compiled train step across entities of identical shape — the
(window, batch, features) shapes are the same for every SMD machine, so XLA
compiles once and the remaining 27 entities pay zero compile time.
"""

from __future__ import annotations

import argparse
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
    args = parser.parse_args()
    cfg = to_run_config(args)
    groups = [g for g in args.groups.split(",") if g] or None
    run_sweep(cfg, groups)


if __name__ == "__main__":
    main()
