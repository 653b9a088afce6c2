#!/usr/bin/env python
"""Entry point: result visualization for a trained run (replaces the
reference's ``result_visualizer.ipynb``).

    python visualize.py --dataset SMD --group 1-1 --model_id -1
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str.upper, default="SMD")
    parser.add_argument("--group", type=str, default="1-1")
    parser.add_argument("--model_id", type=str, default="-1")
    parser.add_argument("--output_root", type=str, default="output")
    parser.add_argument("--feature", type=int, default=0)
    args = parser.parse_args()

    from mtad_gat_tpu.utils.plotting import Plotter

    if args.dataset == "SMD":
        result_path = os.path.join(args.output_root, "SMD", args.group)
    else:
        result_path = os.path.join(args.output_root, args.dataset)

    plotter = Plotter(result_path, model_id=args.model_id)
    plotter.result_summary()
    out = plotter.run_path
    plotter.plot_feature(args.feature, save_path=os.path.join(out, f"feature_{args.feature}.png"))
    plotter.plot_all_features(save_path=os.path.join(out, "all_features.png"))
    plotter.plot_global_predictions(save_path=os.path.join(out, "global_predictions.png"))
    plotter.plot_anomaly_segments(save_path=os.path.join(out, "anomaly_segments.png"))
    # interactive figures (range slider; embedded-spec HTML works without
    # the plotly library — reference plotting.py:154-287,460-493)
    try:
        plotter.write_plotly_html(
            plotter.plotly_feature_figure(args.feature),
            os.path.join(out, f"feature_{args.feature}.html"),
        )
        plotter.write_plotly_html(
            plotter.plotly_global_figure(),
            os.path.join(out, "global_predictions.html"),
        )
    except Exception as e:
        print(f"interactive figures skipped: {e}")
    print(f"plots written to {out}")


if __name__ == "__main__":
    main()
