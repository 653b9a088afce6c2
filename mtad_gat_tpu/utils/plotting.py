"""Visualization / reporting.

Capabilities of reference ``utils.py:153-181`` (loss curves) and
``plotting.py:15-493`` (Plotter: run resolution, result summaries, per-feature
forecast/recon/score plots, all-feature grids, anomaly-segment views, global
score plots). Implemented with matplotlib only — plotly/cufflinks are not in
the TPU image, so interactive variants degrade to static plots with the same
information.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd


def plot_losses(losses: dict, save_path: str = "", plot: bool = False) -> None:
    """Train/validation loss curves (reference ``utils.py:153-181``)."""
    os.makedirs(save_path or ".", exist_ok=True)

    plt.figure()
    plt.plot(losses["train_forecast"], label="Forecast loss")
    plt.plot(losses["train_recon"], label="Recon loss")
    plt.plot(losses["train_total"], label="Total loss")
    plt.title("Training losses during training")
    plt.xlabel("Epoch")
    plt.ylabel("RMSE")
    plt.legend()
    plt.savefig(os.path.join(save_path, "train_losses.png"), bbox_inches="tight")
    plt.close()

    plt.figure()
    plt.plot(losses["val_forecast"], label="Forecast loss")
    plt.plot(losses["val_recon"], label="Recon loss")
    plt.plot(losses["val_total"], label="Total loss")
    plt.title("Validation losses during training")
    plt.xlabel("Epoch")
    plt.ylabel("RMSE")
    plt.legend()
    plt.savefig(os.path.join(save_path, "validation_losses.png"), bbox_inches="tight")
    plt.close()


def get_series_color(y) -> str:
    """Series color for segment plots (reference ``utils.py:192-199`` —
    which, quirk preserved, returns "black" on every branch)."""
    y = np.asarray(y)
    if np.average(y) >= 0.95:
        return "black"
    elif np.average(y) == 0.0:
        return "black"
    else:
        return "black"


def get_y_height(y) -> float:
    """Y-axis height for a segment plot (reference ``utils.py:201-208``):
    1.5 for near-constant-high series, 0.1 for all-zero, else max + 0.1."""
    y = np.asarray(y)
    if np.average(y) >= 0.95:
        return 1.5
    elif np.average(y) == 0.0:
        return 0.1
    else:
        return float(np.max(y) + 0.1)


def get_anomaly_sequences(values: np.ndarray) -> List[List[int]]:
    """Contiguous [start, end] anomaly segments from a 0/1 vector
    (reference ``plotting.py:93-152`` helper semantics)."""
    v = np.asarray(values).astype(int)
    if v.size == 0:
        return []
    diff = np.diff(v)
    starts = list(np.where(diff == 1)[0] + 1)
    ends = list(np.where(diff == -1)[0])
    if v[0]:
        starts = [0] + starts
    if v[-1]:
        ends = ends + [v.size - 1]
    return [[int(s), int(e)] for s, e in zip(starts, ends)]


class Plotter:
    """Result visualization for a trained run directory
    (reference ``plotting.py:15-493``)."""

    def __init__(self, result_path: str, model_id: str = "-1"):
        self.result_path = result_path
        self.model_id = model_id
        self.train_output: Optional[pd.DataFrame] = None
        self.test_output: Optional[pd.DataFrame] = None
        self.labels_available = True
        self.pred_cols = ["A_Score", "Thresh", "A_Pred"]
        self._load_results()
        self.lookback = self._config().get("lookback", 100)

    # -- run resolution (plotting.py:43-56) --
    def _resolve(self) -> str:
        if self.model_id.startswith("-"):
            dir_content = os.listdir(self.result_path)
            subfolders = [
                s for s in dir_content
                if os.path.isdir(os.path.join(self.result_path, s)) and s != "logs"
            ]

            # datetime-named runs sort by their name (reference
            # plotting.py:43-56); custom --run_id names (a TPU extension
            # the reference lacks) fall back to directory mtime
            def run_time(s: str) -> datetime:
                try:
                    return datetime.strptime(s, "%d%m%Y_%H%M%S")
                except ValueError:
                    return datetime.fromtimestamp(
                        os.path.getmtime(os.path.join(self.result_path, s))
                    )

            subfolders.sort(key=run_time)
            return os.path.join(self.result_path, subfolders[int(self.model_id)])
        return os.path.join(self.result_path, self.model_id)

    def _config(self) -> dict:
        path = os.path.join(self.run_path, "config.txt")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def _load_results(self) -> None:
        self.run_path = self._resolve()
        print(f"Loading results of {self.run_path}")
        self.train_output = pd.read_pickle(os.path.join(self.run_path, "train_output.pkl"))
        self.train_output["A_True_Global"] = 0
        self.test_output = pd.read_pickle(os.path.join(self.run_path, "test_output.pkl"))
        if "A_True_Global" not in self.test_output.columns:
            self.labels_available = False

    # -- summaries (plotting.py:71-91) --
    def result_summary(self) -> dict:
        path = os.path.join(self.run_path, "summary.txt")
        if not os.path.exists(path):
            print(f"Folder {self.run_path} do not have a summary.txt file")
            return {}
        with open(path) as f:
            summary = json.load(f)
        for method, res in summary.items():
            if "f1" in res:
                print(
                    f"{method}: f1={res['f1']:.4f} precision={res['precision']:.4f} "
                    f"recall={res['recall']:.4f}"
                )
        return summary

    # -- per-feature plots (plotting.py:154-287) --
    def plot_feature(self, feature: int, plot_train: bool = False,
                     start: int = 0, end: Optional[int] = None,
                     save_path: Optional[str] = None) -> None:
        df = self.train_output if plot_train else self.test_output
        end = len(df) if end is None else end
        assert start < end
        sl = slice(start, end)

        fig, axes = plt.subplots(2, 1, figsize=(14, 6), sharex=True)
        if f"Forecast_{feature}" in df.columns:
            axes[0].plot(df[f"True_{feature}"].values[sl], label="actual", lw=0.8)
            axes[0].plot(df[f"Forecast_{feature}"].values[sl], label="forecast", lw=0.8)
            axes[0].plot(df[f"Recon_{feature}"].values[sl], label="recon", lw=0.8)
        axes[0].set_title(f"Feature {feature}")
        axes[0].legend()
        if f"A_Score_{feature}" in df.columns:
            axes[1].plot(df[f"A_Score_{feature}"].values[sl], label="score", lw=0.8)
            axes[1].plot(df[f"Thresh_{feature}"].values[sl], label="threshold",
                         lw=0.8, ls="--", c="red")
        if self.labels_available and not plot_train:
            for s, e in get_anomaly_sequences(df["A_True_Global"].values[sl]):
                for ax in axes:
                    ax.axvspan(s, e, color="red", alpha=0.15)
        axes[1].legend()
        if save_path:
            plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)

    def plotly_feature_figure(self, feature: int, plot_train: bool = False,
                              start: int = 0, end: Optional[int] = None) -> dict:
        """The interactive per-feature figure as a plain plotly spec —
        forecast/recon/actual on the top axis, anomaly score + threshold on
        the bottom, true/predicted anomaly segments shaded, and an x-range
        slider, mirroring the reference's ``plot_feature`` plotly figure
        (``plotting.py:154-287``). Render with :meth:`write_plotly_html`."""
        df = self.train_output if plot_train else self.test_output
        end = len(df) if end is None else end
        assert start < end
        sl = slice(start, end)

        def series(col):
            return [float(v) for v in df[col].values[sl]]

        data = []
        if f"Forecast_{feature}" in df.columns:
            data.append({"type": "scatter", "y": series(f"True_{feature}"),
                         "name": "actual", "line": {"width": 1},
                         "xaxis": "x", "yaxis": "y"})
            data.append({"type": "scatter", "y": series(f"Forecast_{feature}"),
                         "name": "forecast", "line": {"width": 1},
                         "xaxis": "x", "yaxis": "y"})
            data.append({"type": "scatter", "y": series(f"Recon_{feature}"),
                         "name": "recon", "line": {"width": 1},
                         "xaxis": "x", "yaxis": "y"})
        score_max = 1.0
        if f"A_Score_{feature}" in df.columns:
            score = series(f"A_Score_{feature}")
            score_max = max(score) if score else 1.0
            data.append({"type": "scatter", "y": score, "name": "score",
                         "line": {"width": 1}, "xaxis": "x", "yaxis": "y2"})
            data.append({"type": "scatter", "y": series(f"Thresh_{feature}"),
                         "name": "threshold",
                         "line": {"width": 1, "dash": "dash", "color": "red"},
                         "xaxis": "x", "yaxis": "y2"})

        shapes = []
        if self.labels_available and not plot_train:
            true_ranges = get_anomaly_sequences(df["A_True_Global"].values[sl])
            # shade both stacked axes (reference shades its two figures)
            shapes += self.create_shapes(true_ranges, "true", 0.0, score_max,
                                         None, xref="x", yref="y2")
        if f"A_Pred_{feature}" in df.columns:
            pred_ranges = get_anomaly_sequences(df[f"A_Pred_{feature}"].values[sl])
            shapes += self.create_shapes(pred_ranges, "predicted", 0.0,
                                         score_max, None, xref="x", yref="y2")

        return {
            "data": data,
            "layout": {
                "title": {"text": f"Feature {feature}"},
                "grid": {"rows": 2, "columns": 1, "shared_xaxes": True},
                "yaxis": {"domain": [0.55, 1.0], "title": {"text": "value"}},
                "yaxis2": {"domain": [0.0, 0.45], "title": {"text": "score"}},
                "xaxis": {"rangeslider": {"visible": True, "thickness": 0.05}},
                "shapes": shapes,
            },
        }

    def plot_all_features(self, plot_train: bool = False,
                          save_path: Optional[str] = None) -> None:
        """All-feature grid (plotting.py:289-318)."""
        df = self.train_output if plot_train else self.test_output
        features = sorted(
            int(c.split("_")[-1]) for c in df.columns if c.startswith("A_Score_")
            and c != "A_Score_Global"
        )
        n = len(features)
        fig, axes = plt.subplots(n, 1, figsize=(14, 1.6 * n), sharex=True, squeeze=False)
        for i, f in enumerate(features):
            axes[i][0].plot(df[f"A_Score_{f}"].values, lw=0.5)
            axes[i][0].set_ylabel(str(f))
        if save_path:
            plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)

    def plot_anomaly_segments(self, save_path: Optional[str] = None) -> None:
        """Aligned anomaly-segment view (plotting.py:320-435)."""
        df = self.test_output
        if not self.labels_available:
            print("No labels available")
            return
        segments = get_anomaly_sequences(df["A_True_Global"].values)
        n = min(len(segments), 12)
        if n == 0:
            print("No anomaly segments")
            return
        fig, axes = plt.subplots(1, n, figsize=(2.5 * n, 3), squeeze=False)
        for i, (s, e) in enumerate(segments[:n]):
            pad = max(20, (e - s))
            sl = slice(max(0, s - pad), min(len(df), e + pad))
            axes[0][i].plot(range(sl.start, sl.stop),
                            df["A_Score_Global"].values[sl], lw=0.7)
            axes[0][i].axvspan(s, e, color="red", alpha=0.15)
        if save_path:
            plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)

    def plot_global_predictions(self, plot_train: bool = False,
                                save_path: Optional[str] = None) -> None:
        """Global score vs threshold with predicted/true anomalies
        (plotting.py:437-493)."""
        df = self.train_output if plot_train else self.test_output
        fig, ax = plt.subplots(figsize=(14, 4))
        ax.plot(df["A_Score_Global"].values, label="global score", lw=0.7)
        if "Thresh_Global" in df.columns:
            ax.plot(df["Thresh_Global"].values, label="threshold", lw=0.8,
                    ls="--", c="red")
        if "A_Pred_Global" in df.columns:
            preds = df["A_Pred_Global"].values
            idx = np.where(preds > 0)[0]
            ax.scatter(idx, df["A_Score_Global"].values[idx], s=4, c="orange",
                       label="predicted anomaly")
        if self.labels_available and not plot_train:
            for s, e in get_anomaly_sequences(df["A_True_Global"].values):
                ax.axvspan(s, e, color="red", alpha=0.15)
        ax.legend()
        if save_path:
            plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)

    # -- plotly surface (plotting.py:93-152,460-493) --
    @staticmethod
    def create_shapes(ranges, sequence_type, _min, _max, plot_values,
                      is_test: bool = True, xref=None, yref=None) -> list:
        """Rectangle shape specs for highlighted anomaly regions, in plotly's
        shape-dict format (reference ``plotting.py:93-152``): each [start,
        end] range is widened by 5 steps, colored red for true anomalies and
        blue for predictions, at 0.08 opacity. Pure data — usable with or
        without plotly installed."""
        if _max is None:
            _max = max(plot_values["errors"])
        color = "red" if sequence_type == "true" else "blue"
        shapes = []
        for start, end in ranges:
            shape = {
                "type": "rect",
                "x0": start - 5,
                "y0": _min,
                "x1": end + 5,
                "y1": _max,
                "fillcolor": color,
                "opacity": 0.08,
                "line": {"width": 0},
            }
            if xref is not None:
                shape["xref"] = xref
                shape["yref"] = yref
            shapes.append(shape)
        return shapes

    def plotly_global_figure(self, plot_train: bool = False) -> dict:
        """The interactive global-score figure as a plain plotly figure spec
        (data + layout dicts) — the same JSON plotly itself would serialize
        (reference ``plotting.py:460-493``), built without needing the plotly
        library."""
        df = self.train_output if plot_train else self.test_output
        score = df["A_Score_Global"].values
        shapes = []
        if self.labels_available and not plot_train:
            true_ranges = get_anomaly_sequences(df["A_True_Global"].values)
            shapes += self.create_shapes(
                true_ranges, "true", 0.0, float(np.max(score)), None
            )
        if "A_Pred_Global" in df.columns:
            pred_ranges = get_anomaly_sequences(df["A_Pred_Global"].values)
            shapes += self.create_shapes(
                pred_ranges, "predicted", 0.0, float(np.max(score)), None
            )
        data = [{
            "type": "scatter", "y": [float(v) for v in score],
            "name": "global score", "line": {"width": 1},
        }]
        if "Thresh_Global" in df.columns:
            data.append({
                "type": "scatter",
                "y": [float(v) for v in df["Thresh_Global"].values],
                "name": "threshold",
                "line": {"width": 1, "dash": "dash", "color": "red"},
            })
        return {
            "data": data,
            "layout": {"shapes": shapes, "title": {"text": "Global anomaly score"}},
        }

    @staticmethod
    def write_plotly_html(fig: dict, path: str) -> None:
        """Standalone interactive HTML from a figure spec: embeds the figure
        JSON and loads plotly.js from the CDN, so no python plotly install is
        needed to produce (or view) it."""
        import json as _json

        html = (
            "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
            "<script src=\"https://cdn.plot.ly/plotly-2.35.2.min.js\"></script>"
            "</head><body><div id=\"fig\" style=\"height:95vh\"></div>"
            "<script>var spec = "
            + _json.dumps(fig)
            + ";Plotly.newPlot('fig', spec.data, spec.layout);</script>"
            "</body></html>"
        )
        with open(path, "w") as f:
            f.write(html)

    def plotly_global_predictions(self, plot_train: bool = False,
                                  save_path: Optional[str] = None) -> None:
        """Interactive global-score plot (reference ``plotting.py:460-493``).
        Renders with plotly when it is installed; without it, an .html
        save_path still gets a real interactive figure (CDN-embedded spec),
        and only the no-save interactive display falls back to matplotlib."""
        fig_dict = self.plotly_global_figure(plot_train=plot_train)
        try:
            import plotly.graph_objects as go
        except ImportError:
            if save_path and save_path.endswith(".html"):
                self.write_plotly_html(fig_dict, save_path)
                return
            print("plotly not installed; falling back to matplotlib display")
            return self.plot_global_predictions(
                plot_train=plot_train, save_path=save_path
            )

        fig = go.Figure(fig_dict)
        if save_path:
            fig.write_html(save_path)
        else:
            fig.show()
