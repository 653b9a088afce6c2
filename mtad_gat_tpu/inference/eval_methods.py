"""Thresholding and evaluation under the point-adjust protocol.

Same behavior as reference ``eval_methods.py`` (which in turn follows
OmniAnomaly / TelemAnom), re-implemented vectorized over anomaly segments
instead of the reference's python backward-fill loop
(``eval_methods.py:37-51``). All published F1 numbers depend on these exact
semantics, including the quirks:

- the backward fill never reaches index 0 (``range(i, 0, -1)``), so a segment
  that starts at position 0 and is first detected later keeps position 0
  unadjusted;
- predictions use strict ``score > threshold`` here but ``>=`` for the
  per-feature epsilon preds in the predictor;
- latency is (sum over detected segments of points before the first hit),
  normalized by (detected segments + 1e-4);
- ``find_epsilon`` scans z in [2.5, 12) step 0.5 with a +/-49-index buffer and
  rejects candidates flagging >= 50% of points.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from mtad_gat_tpu.inference.spot import SPOT


def _segments(actual: np.ndarray):
    """Contiguous True runs of ``actual`` as (start, end) inclusive pairs."""
    a = np.asarray(actual).astype(bool)
    if a.size == 0:
        return []
    diff = np.diff(a.astype(np.int8))
    starts = list(np.where(diff == 1)[0] + 1)
    ends = list(np.where(diff == -1)[0])
    if a[0]:
        starts = [0] + starts
    if a[-1]:
        ends = ends + [a.size - 1]
    return list(zip(starts, ends))


def adjust_predicts(
    score: Optional[np.ndarray],
    label: Optional[np.ndarray],
    threshold: Optional[float],
    pred: Optional[np.ndarray] = None,
    calc_latency: bool = False,
):
    """Point-adjust (reference ``eval_methods.py:6-55``): if any point of a
    true anomaly segment is predicted, the whole segment counts as detected
    (except index 0 — see module docstring)."""
    if label is None:
        predict = score > threshold
        return predict, None

    if pred is None:
        if len(score) != len(label):
            raise ValueError("score and label must have the same length")
        predict = np.asarray(score) > threshold
    else:
        predict = np.asarray(pred).astype(bool).copy()

    actual = np.asarray(label) > 0.1
    predict = np.asarray(predict).astype(bool).copy()
    latency = 0
    anomaly_count = 0
    for s, e in _segments(actual):
        seg = predict[s : e + 1]
        if not seg.any():
            continue
        anomaly_count += 1
        first = s + int(np.argmax(seg))
        fill_from = max(s, 1)  # backward fill in the reference stops at j=1
        latency += int(first - fill_from)
        predict[fill_from : e + 1] = True
    predict = predict.astype(int) if pred is not None else predict
    if calc_latency:
        return predict, latency / (anomaly_count + 1e-4)
    return predict


def calc_point2point(predict: np.ndarray, actual: np.ndarray):
    """F1/P/R/TP/TN/FP/FN with 1e-5 smoothing (reference
    ``eval_methods.py:58-73``)."""
    predict = np.asarray(predict, dtype=np.float64)
    actual = np.asarray(actual, dtype=np.float64)
    TP = np.sum(predict * actual)
    TN = np.sum((1 - predict) * (1 - actual))
    FP = np.sum(predict * (1 - actual))
    FN = np.sum((1 - predict) * actual)
    precision = TP / (TP + FP + 0.00001)
    recall = TP / (TP + FN + 0.00001)
    f1 = 2 * precision * recall / (precision + recall + 0.00001)
    return f1, precision, recall, TP, TN, FP, FN


def pot_eval(
    init_score: np.ndarray,
    score: np.ndarray,
    label: Optional[np.ndarray],
    q: float = 1e-3,
    level: float = 0.99,
    dynamic: bool = False,
) -> Dict:
    """Peaks-over-threshold evaluation (reference ``eval_methods.py:76-117``):
    SPOT calibrated on train scores, threshold = mean of streamed thresholds,
    point-adjusted metrics."""
    print(f"Running POT with q={q}, level={level}..")
    s = SPOT(q)
    s.fit(init_score, score)
    s.initialize(level=level, min_extrema=False)
    ret = s.run(dynamic=dynamic, with_alarm=False)
    pot_th = float(np.mean(ret["thresholds"]))
    pred, p_latency = adjust_predicts(score, label, pot_th, calc_latency=True)
    if label is not None:
        p_t = calc_point2point(pred, label)
        return {
            "f1": p_t[0], "precision": p_t[1], "recall": p_t[2],
            "TP": p_t[3], "TN": p_t[4], "FP": p_t[5], "FN": p_t[6],
            "threshold": pot_th, "latency": p_latency,
        }
    return {"threshold": pot_th}


def calc_seq(score, label, threshold):
    predict, latency = adjust_predicts(score, label, threshold, calc_latency=True)
    return calc_point2point(predict, label), latency


def bf_search(
    score: np.ndarray,
    label: np.ndarray,
    start: float,
    end: Optional[float] = None,
    step_num: int = 1,
    display_freq: int = 1,
    verbose: bool = True,
    use_native: bool = True,
) -> Dict:
    """Best-F1 threshold grid search (reference ``eval_methods.py:120-157``).
    Note the reference increments BEFORE evaluating, so the first tested
    threshold is start + range/step_num — replicated.

    When the native host library is available (and no verbose tracing is
    requested) the search runs in C++ with OpenMP across thresholds — same
    semantics, each threshold a full point-adjust + metrics pass."""
    print("Finding best f1-score by searching for threshold..")
    if (
        use_native and not verbose and end is not None
        and step_num and step_num > 1 and label is not None
    ):
        from mtad_gat_tpu.native import bf_search_native

        res = bf_search_native(score, label, start, end, step_num)
        if res is not None:
            return res
    if step_num is None or end is None:
        end = start
        step_num = 1
    search_step, search_range, search_lower_bound = step_num, end - start, start
    if verbose:
        print("search range: ", search_lower_bound, search_lower_bound + search_range)
    threshold = search_lower_bound
    m = (-1.0, -1.0, -1.0)
    m_t = 0.0
    m_l = 0
    for i in range(search_step):
        threshold += search_range / float(search_step)
        target, latency = calc_seq(score, label, threshold)
        if target[0] > m[0]:
            m_t = threshold
            m = target
            m_l = latency
        if verbose and i % display_freq == 0:
            print("cur thr: ", threshold, target, m, m_t)
    return {
        "f1": m[0], "precision": m[1], "recall": m[2],
        "TP": m[3], "TN": m[4], "FP": m[5], "FN": m[6],
        "threshold": m_t, "latency": m_l,
    }


def epsilon_eval(
    train_scores: np.ndarray,
    test_scores: np.ndarray,
    test_labels: Optional[np.ndarray],
    reg_level: int = 1,
) -> Dict:
    """Reference ``eval_methods.py:165-183``."""
    best_epsilon = find_epsilon(train_scores, reg_level)
    pred, p_latency = adjust_predicts(test_scores, test_labels, best_epsilon, calc_latency=True)
    if test_labels is not None:
        p_t = calc_point2point(pred, test_labels)
        return {
            "f1": p_t[0], "precision": p_t[1], "recall": p_t[2],
            "TP": p_t[3], "TN": p_t[4], "FP": p_t[5], "FN": p_t[6],
            "threshold": best_epsilon, "latency": p_latency,
            "reg_level": reg_level,
        }
    return {"threshold": best_epsilon, "reg_level": reg_level}


def find_epsilon(errors: np.ndarray, reg_level: int = 1) -> float:
    """Hundman et al. epsilon (reference ``eval_methods.py:186-236``):
    scan z in [2.5, 12) step 0.5, epsilon = mu + z*sigma; score each candidate
    by the %-drop in mean and std after pruning, regularized by the flagged
    count^reg_level with a +/-49-index buffer; reject if >= 50% flagged."""
    e_s = np.asarray(errors)
    best_epsilon = None
    max_score = -10000000
    mean_e_s = np.mean(e_s)
    sd_e_s = np.std(e_s)

    for z in np.arange(2.5, 12, 0.5):
        epsilon = mean_e_s + sd_e_s * z
        pruned_e_s = e_s[e_s < epsilon]

        i_anom = np.argwhere(e_s >= epsilon).reshape(-1)
        buffer = np.arange(1, 50)
        if len(i_anom) > 0:
            i_anom = np.concatenate(
                (
                    i_anom,
                    (i_anom[:, None] + buffer[None, :]).flatten(),
                    (i_anom[:, None] - buffer[None, :]).flatten(),
                )
            )
            i_anom = i_anom[(i_anom < len(e_s)) & (i_anom >= 0)]
            i_anom = np.sort(np.unique(i_anom))

        if len(i_anom) > 0:
            mean_perc_decrease = (mean_e_s - np.mean(pruned_e_s)) / mean_e_s
            sd_perc_decrease = (sd_e_s - np.std(pruned_e_s)) / sd_e_s
            if reg_level == 0:
                denom = 1
            elif reg_level == 1:
                denom = len(i_anom)
            elif reg_level == 2:
                denom = len(i_anom) ** 2
            else:
                raise ValueError(f"unsupported reg_level {reg_level}")

            score = (mean_perc_decrease + sd_perc_decrease) / denom
            if score >= max_score and len(i_anom) < (len(e_s) * 0.5):
                max_score = score
                best_epsilon = epsilon

    if best_epsilon is None:
        best_epsilon = np.max(e_s)
    return float(best_epsilon)
