"""Anomaly scoring and prediction.

Capabilities of reference ``prediction.py:7-202`` with a TPU-native scoring
pass:

The reference runs TWO forward passes per window — one on the window for the
forecast, one on the window shifted by a step for the reconstruction
(``prediction.py:55-63``). But the shifted window [i+1 : i+1+w) IS the next
sliding window, so a single pass over windows 0..T-w suffices: window j
yields the forecast used at t=j+w and the last-step reconstruction used at
t=j+w-1. We run one jitted scan over all windows and split the outputs —
half the FLOPs of the reference scoring loop.

Score semantics preserved exactly (``prediction.py:72-94``): per-feature
score = |forecast - actual| + gamma * |recon - actual| (computed as sqrt of
squares like the reference), optional median/IQR scaling, global score =
feature mean; then channel-boundary adjustment for MSL/SMAP, optional EWM
smoothing with span = int(256 * window * 0.05), per-feature epsilon
thresholds (reg_level=2), and entity-level evaluation with the three
thresholding methods, JSON summary, and output pickles.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from mtad_gat_tpu.data.loading import adjust_anomaly_scores
from mtad_gat_tpu.data.windows import batched_starts, gather_windows
from mtad_gat_tpu.inference.eval_methods import (
    adjust_predicts,
    bf_search,
    epsilon_eval,
    find_epsilon,
    pot_eval,
)
from mtad_gat_tpu.models import MTADGAT


class Predictor:
    """Mirrors the reference Predictor surface: ``get_score`` and
    ``predict_anomalies`` (``prediction.py:36,96``)."""

    def __init__(
        self,
        model: MTADGAT,
        params: dict,
        window_size: int,
        n_features: int,
        pred_args: Dict,
        summary_file_name: str = "summary.txt",
        batch_size: int = 256,
        data_root: str = "datasets",
    ):
        self.model = model
        self.params = params
        self.window_size = window_size
        self.n_features = n_features
        self.dataset = pred_args["dataset"]
        self.target_dims = pred_args["target_dims"]
        self.scale_scores = pred_args["scale_scores"]
        self.q = pred_args["q"]
        self.level = pred_args["level"]
        self.dynamic_pot = pred_args["dynamic_pot"]
        self.use_mov_av = pred_args["use_mov_av"]
        self.gamma = pred_args["gamma"]
        self.reg_level = pred_args["reg_level"]
        self.save_path = pred_args["save_path"]
        self.batch_size = batch_size
        self.summary_file_name = summary_file_name
        self.data_root = data_root

        model_apply = model.apply

        @jax.jit
        def score_scan(params, series, starts, mask):
            def step(_, xs):
                st, m = xs
                x = gather_windows(series, st, window_size)
                preds, recons = model_apply({"params": params}, x, deterministic=True)
                # last-step reconstruction only (prediction.py:63)
                return None, (preds, recons[:, -1, :])

            _, (preds, recon_last) = jax.lax.scan(step, None, (starts, mask))
            return preds, recon_last

        self._score_scan = score_scan

    # ------------------------------------------------------------------
    def get_score(self, values: np.ndarray) -> pd.DataFrame:
        """Anomaly scores for a full series (reference ``prediction.py:36-94``)."""
        print("Predicting and calculating anomaly scores..")
        values = np.asarray(values, dtype=np.float32)
        T = values.shape[0]
        w = self.window_size
        n_eval = T - w            # number of scored timesteps (t = w .. T-1)
        # single pass over windows 0..T-w inclusive (see module docstring)
        starts, mask, _ = batched_starts(n_eval + 1, self.batch_size)
        series = jnp.asarray(values)
        preds_all, recon_all = self._score_scan(self.params, series, starts, mask)
        out_dim = preds_all.shape[-1]
        preds_all = np.asarray(preds_all).reshape(-1, out_dim)[: n_eval + 1]
        recon_all = np.asarray(recon_all).reshape(-1, out_dim)[: n_eval + 1]
        preds = preds_all[:-1]        # forecast of window i -> point i+w
        recons = recon_all[1:]        # recon-last of window i+1 -> point i+w

        actual = values[w:]
        if self.target_dims is not None:
            actual = actual[:, list(self.target_dims)]

        anomaly_scores = np.zeros_like(actual)
        df_dict = {}
        for i in range(preds.shape[1]):
            df_dict[f"Forecast_{i}"] = preds[:, i]
            df_dict[f"Recon_{i}"] = recons[:, i]
            df_dict[f"True_{i}"] = actual[:, i]
            a_score = np.sqrt((preds[:, i] - actual[:, i]) ** 2) + self.gamma * np.sqrt(
                (recons[:, i] - actual[:, i]) ** 2
            )
            if self.scale_scores:
                q75, q25 = np.percentile(a_score, [75, 25])
                iqr = q75 - q25
                median = np.median(a_score)
                a_score = (a_score - median) / (1 + iqr)
            anomaly_scores[:, i] = a_score
            df_dict[f"A_Score_{i}"] = a_score

        df = pd.DataFrame(df_dict)
        df["A_Score_Global"] = np.mean(anomaly_scores, 1)
        return df

    # ------------------------------------------------------------------
    def predict_anomalies(
        self,
        train: np.ndarray,
        test: np.ndarray,
        true_anomalies: Optional[np.ndarray],
        load_scores: bool = False,
        save_output: bool = True,
        scale_scores: bool = False,
    ) -> Dict:
        """Reference ``prediction.py:96-202``; returns the summary dict."""
        if load_scores:
            print("Loading anomaly scores")
            train_pred_df = pd.read_pickle(f"{self.save_path}/train_output.pkl")
            test_pred_df = pd.read_pickle(f"{self.save_path}/test_output.pkl")
            train_anomaly_scores = train_pred_df["A_Score_Global"].values
            test_anomaly_scores = test_pred_df["A_Score_Global"].values
        else:
            train_pred_df = self.get_score(train)
            test_pred_df = self.get_score(test)
            train_anomaly_scores = adjust_anomaly_scores(
                train_pred_df["A_Score_Global"].values, self.dataset, True,
                self.window_size, data_root=self.data_root,
            )
            test_anomaly_scores = adjust_anomaly_scores(
                test_pred_df["A_Score_Global"].values, self.dataset, False,
                self.window_size, data_root=self.data_root,
            )
            train_pred_df["A_Score_Global"] = train_anomaly_scores
            test_pred_df["A_Score_Global"] = test_anomaly_scores

        if self.use_mov_av:
            smoothing_window = int(self.batch_size * self.window_size * 0.05)
            train_anomaly_scores = (
                pd.DataFrame(train_anomaly_scores).ewm(span=smoothing_window)
                .mean().values.flatten()
            )
            test_anomaly_scores = (
                pd.DataFrame(test_anomaly_scores).ewm(span=smoothing_window)
                .mean().values.flatten()
            )

        # Per-feature thresholds (diagnostics; prediction.py:137-154)
        out_dim = self.n_features if self.target_dims is None else len(self.target_dims)
        all_preds = np.zeros((len(test_pred_df), out_dim))
        for i in range(out_dim):
            train_feature_scores = train_pred_df[f"A_Score_{i}"].values
            test_feature_scores = test_pred_df[f"A_Score_{i}"].values
            epsilon = find_epsilon(train_feature_scores, reg_level=2)
            train_feature_preds = (train_feature_scores >= epsilon).astype(int)
            test_feature_preds = (test_feature_scores >= epsilon).astype(int)
            train_pred_df[f"A_Pred_{i}"] = train_feature_preds
            test_pred_df[f"A_Pred_{i}"] = test_feature_preds
            train_pred_df[f"Thresh_{i}"] = epsilon
            test_pred_df[f"Thresh_{i}"] = epsilon
            all_preds[:, i] = test_feature_preds

        # Entity-level evaluation with the three methods
        e_eval = epsilon_eval(
            train_anomaly_scores, test_anomaly_scores, true_anomalies,
            reg_level=self.reg_level,
        )
        p_eval = pot_eval(
            train_anomaly_scores, test_anomaly_scores, true_anomalies,
            q=self.q, level=self.level, dynamic=self.dynamic_pot,
        )
        if true_anomalies is not None:
            bf_eval = bf_search(
                test_anomaly_scores, true_anomalies, start=0.01, end=2,
                step_num=100, verbose=False,
            )
        else:
            bf_eval = {}

        print(f"Results using epsilon method:\n {e_eval}")
        print(f"Results using peak-over-threshold method:\n {p_eval}")
        print(f"Results using best f1 score search:\n {bf_eval}")

        for k, v in e_eval.items():
            if not isinstance(v, list):
                e_eval[k] = float(v)
        for k, v in p_eval.items():
            if not isinstance(v, list):
                p_eval[k] = float(v)
        for k, v in bf_eval.items():
            bf_eval[k] = float(v)

        summary = {"epsilon_result": e_eval, "pot_result": p_eval, "bf_result": bf_eval}
        os.makedirs(self.save_path, exist_ok=True)
        with open(f"{self.save_path}/{self.summary_file_name}", "w") as f:
            json.dump(summary, f, indent=2)

        if save_output:
            global_epsilon = e_eval["threshold"]
            test_pred_df["A_True_Global"] = true_anomalies
            train_pred_df["Thresh_Global"] = global_epsilon
            test_pred_df["Thresh_Global"] = global_epsilon
            train_pred_df["A_Pred_Global"] = (
                train_anomaly_scores >= global_epsilon
            ).astype(int)
            test_preds_global = (test_anomaly_scores >= global_epsilon).astype(int)
            if true_anomalies is not None:
                test_preds_global = adjust_predicts(
                    None, true_anomalies, global_epsilon, pred=test_preds_global
                )
            test_pred_df["A_Pred_Global"] = test_preds_global
            print(f"Saving output to {self.save_path}/<train/test>_output.pkl")
            train_pred_df.to_pickle(f"{self.save_path}/train_output.pkl")
            test_pred_df.to_pickle(f"{self.save_path}/test_output.pkl")

        print("-- Done.")
        return summary
