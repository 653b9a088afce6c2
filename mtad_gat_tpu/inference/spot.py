"""Streaming Peaks-Over-Threshold (SPOT), upper-bound variant.

Same algorithm as reference ``spot.py:29-509`` (SPOT from Siffer et al.,
"Anomaly Detection in Streams with Extreme Value Theory", KDD'17):

- calibration: empirical-quantile initial threshold on the train scores
  (``spot.py:198-199``), peak excesses above it, GPD fit via Grimshaw's trick
  (candidate roots of w(t) found by L-BFGS-B on a sum-of-squares objective
  over a regular grid, ``spot.py:223-272,299-382``), extreme quantile from
  the fitted (gamma, sigma) (``spot.py:384-403``);
- run: static mode keeps the initial fit; dynamic mode re-fits the GPD each
  time a new peak arrives (``spot.py:405-473``).

This is a host-side (numpy/scipy) component by design — it is stateful and
streaming, not a TPU hot path (SURVEY.md §7). The dynamic-mode re-fit reuses
incremental peak bookkeeping but the same per-fit math.

The two-sided (biSPOT/bidSPOT) variants in the reference are dead code never
reached from its pipeline (SURVEY.md §2.5) and are intentionally not carried.
The drift-aware dSPOT behavior (``--dynamic_pot``) is reached in the reference
via ``SPOT.run(dynamic=True)``, which this class provides.
"""

from __future__ import annotations

from math import floor, log
from typing import Dict, Optional

import numpy as np
from scipy.optimize import minimize


class SPOT:
    def __init__(self, q: float = 1e-4):
        self.proba = q
        self.extreme_quantile: Optional[float] = None
        self.data: Optional[np.ndarray] = None
        self.init_data: Optional[np.ndarray] = None
        self.init_threshold: Optional[float] = None
        self.peaks: Optional[np.ndarray] = None
        self.n = 0
        self.Nt = 0

    # ------------------------------------------------------------------
    def fit(self, init_data, data) -> None:
        self.data = np.asarray(data, dtype=np.float64)
        if isinstance(init_data, int):
            self.init_data = self.data[:init_data]
            self.data = self.data[init_data:]
        elif isinstance(init_data, float) and 0 < init_data < 1:
            r = int(init_data * self.data.size)
            self.init_data = self.data[:r]
            self.data = self.data[r:]
        else:
            self.init_data = np.asarray(init_data, dtype=np.float64)

    def add(self, data) -> None:
        self.data = np.append(self.data, np.asarray(data))

    # ------------------------------------------------------------------
    def initialize(self, level: float = 0.98, min_extrema: bool = False,
                   verbose: bool = False) -> None:
        if min_extrema:
            self.init_data = -self.init_data
            self.data = -self.data
            level = 1 - level

        level = level - floor(level)
        n_init = self.init_data.size
        S = np.sort(self.init_data)
        self.init_threshold = S[int(level * n_init)]
        self.peaks = (
            self.init_data[self.init_data > self.init_threshold] - self.init_threshold
        )
        self.Nt = self.peaks.size
        self.n = n_init

        if self.Nt == 0:
            # no excesses above the initial threshold: no tail to fit; fall
            # back to the empirical threshold (robustness guard; the
            # reference crashes here)
            self.extreme_quantile = float(self.init_threshold)
            return

        g, s, _ = self._grimshaw()
        self.extreme_quantile = self._quantile(g, s)
        if verbose:
            print(f"Initial threshold : {self.init_threshold}")
            print(f"Number of peaks : {self.Nt}")
            print(f"Extreme quantile : {self.extreme_quantile}")

    # ------------------------------------------------------------------
    @staticmethod
    def _roots_finder(fun, jac, bounds, npoints, method="regular") -> np.ndarray:
        if method == "regular":
            step = (bounds[1] - bounds[0]) / (npoints + 1)
            # degenerate interval (all peaks equal, or numerically collapsed
            # bounds): no roots to search — robustness guard the reference
            # lacks (it crashes on such inputs)
            if not np.isfinite(step) or step <= 0:
                return np.array([])
            X0 = np.arange(bounds[0] + step, bounds[1], step)
        else:
            X0 = np.random.uniform(bounds[0], bounds[1], npoints)
        if X0.size == 0:
            return np.array([])

        def obj(X):
            g = 0.0
            j = np.zeros(X.shape)
            for i, x in enumerate(X):
                fx = fun(x)
                g += fx ** 2
                j[i] = 2 * fx * jac(x)
            return g, j

        opt = minimize(
            obj, X0, method="L-BFGS-B", jac=True, bounds=[bounds] * len(X0)
        )
        X = np.round(opt.x, decimals=5)
        return np.unique(X)

    @staticmethod
    def _log_likelihood(Y: np.ndarray, gamma: float, sigma: float) -> float:
        n = Y.size
        if gamma != 0:
            tau = gamma / sigma
            return -n * log(sigma) - (1 + 1 / gamma) * np.log(1 + tau * Y).sum()
        return n * (1 + log(Y.mean()))

    def _grimshaw(self, epsilon: float = 1e-8, n_points: int = 10):
        peaks = self.peaks

        def u(s):
            return 1 + np.log(s).mean()

        def v(s):
            return np.mean(1 / s)

        def w(t):
            s = 1 + t * peaks
            return u(s) * v(s) - 1

        def jac_w(t):
            s = 1 + t * peaks
            us, vs = u(s), v(s)
            jac_us = (1 / t) * (1 - vs)
            jac_vs = (1 / t) * (-vs + np.mean(1 / s ** 2))
            return us * jac_vs + vs * jac_us

        Ym, YM, Ymean = peaks.min(), peaks.max(), peaks.mean()
        if YM <= 0 or Ym == YM:
            # single-valued/degenerate excesses: exponential-tail fallback
            return 0.0, max(float(Ymean), 1e-12), self._log_likelihood(
                np.maximum(peaks, 1e-12), 0.0, max(float(Ymean), 1e-12)
            )
        a = -1 / YM
        if abs(a) < 2 * epsilon:
            epsilon = abs(a) / n_points
        a = a + epsilon
        b = 2 * (Ymean - Ym) / (Ymean * Ym)
        c = 2 * (Ymean - Ym) / (Ym ** 2)

        left_zeros = self._roots_finder(w, jac_w, (a + epsilon, -epsilon), n_points)
        right_zeros = self._roots_finder(w, jac_w, (b, c), n_points)
        zeros = np.concatenate((left_zeros, right_zeros))

        gamma_best, sigma_best = 0.0, Ymean
        ll_best = self._log_likelihood(peaks, gamma_best, sigma_best)
        for z in zeros:
            if z == 0:
                continue
            gamma = u(1 + z * peaks) - 1
            sigma = gamma / z
            if sigma <= 0:
                continue
            ll = self._log_likelihood(peaks, gamma, sigma)
            if ll > ll_best:
                gamma_best, sigma_best, ll_best = gamma, sigma, ll
        return gamma_best, sigma_best, ll_best

    def _quantile(self, gamma: float, sigma: float) -> float:
        r = self.n * self.proba / self.Nt
        if gamma != 0:
            return self.init_threshold + (sigma / gamma) * (pow(r, -gamma) - 1)
        return self.init_threshold - sigma * log(r)

    # ------------------------------------------------------------------
    def run(self, with_alarm: bool = True, dynamic: bool = True) -> Dict:
        if self.n > self.init_data.size:
            print("Warning: algorithm already run, initialize before running again")
            return {}

        th, alarm = [], []
        data = self.data
        if not dynamic:
            # Static mode: the threshold never changes; with_alarm compares to
            # the init threshold (reference spot.py:436-439).
            if with_alarm:
                for i in range(data.size):
                    if data[i] > self.init_threshold:
                        self.extreme_quantile = self.init_threshold
                        alarm.append(i)
                    th.append(self.extreme_quantile)
            else:
                th = [self.extreme_quantile] * data.size
            return {"thresholds": th, "alarms": alarm}

        for i in range(data.size):
            x = data[i]
            if x > self.extreme_quantile:
                if with_alarm:
                    alarm.append(i)
                else:
                    self.peaks = np.append(self.peaks, x - self.init_threshold)
                    self.Nt += 1
                    self.n += 1
                    g, s, _ = self._grimshaw()
                    self.extreme_quantile = self._quantile(g, s)
            elif x > self.init_threshold:
                self.peaks = np.append(self.peaks, x - self.init_threshold)
                self.Nt += 1
                self.n += 1
                g, s, _ = self._grimshaw()
                self.extreme_quantile = self._quantile(g, s)
            else:
                self.n += 1
            th.append(self.extreme_quantile)
        return {"thresholds": th, "alarms": alarm}
