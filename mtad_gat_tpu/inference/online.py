"""Online (streaming) anomaly scoring — the production-serving path.

The reference can only score a complete series offline
(``prediction.py:36-94`` batches the whole test set). This module scores
points AS THEY ARRIVE with O(window) state and exactly one jitted forward
pass per point, producing the same per-timestep scores as the offline
``Predictor.get_score`` (tested):

- score at time t needs the forecast from window [t-w, t) and the last-step
  reconstruction of window (t-w, t]. The forecast for t is computed when
  point t-1 arrives (it is the "next-step" output of that window), held as
  the pending forecast, and consumed when x_t arrives — one forward per
  point instead of the naive two, the streaming form of the offline
  single-pass trick (``predictor.py`` module docstring).
- the window lives in a device-resident ring buffer advanced inside the
  jitted step (donated, so the update is in-place on TPU); per-point
  host<->device traffic is one (k,) point in and three small arrays out.
- thresholding is either a fixed epsilon (Hundman, from the training scores)
  or streaming POT: ``SPOT.step`` — the incrementalized body of
  ``SPOT.run(dynamic=True)`` (``spot.py:210``) — re-fits the GPD tail online
  exactly like the batch run.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtad_gat_tpu.inference.eval_methods import find_epsilon
from mtad_gat_tpu.inference.spot import SPOT
from mtad_gat_tpu.models import MTADGAT


def make_one_point(model_apply, dims, gamma):
    """Build the per-point streaming scoring step shared by the solo scorer
    and the vmapped fleet scorer (``online_fleet.py``): roll the ring buffer,
    run ONE forward on the window ending at the new point (forecast of the
    NEXT point + recon of the newest point — ``prediction.py:55-63``
    semantics, streamed), and score entirely on-device so one host fetch
    retrieves everything.

    ``dims`` is a jnp index array for target-dims slicing or None. Returns
    ``one_point(params, buffer, pending, x) -> (buffer, forecast, outs)``
    with ``outs = (pending, recon, a_score, global_score)``."""
    gamma_c = float(gamma)

    def one_point(params, buffer, pending, x):
        buffer = jnp.concatenate([buffer[1:], x[None, :]], axis=0)
        preds, recons = model_apply(
            {"params": params}, buffer[None], deterministic=True
        )
        recon = recons[0, -1, :]
        actual = x if dims is None else x[dims]
        a_score = (
            jnp.sqrt((pending - actual) ** 2)
            + gamma_c * jnp.sqrt((recon - actual) ** 2)
        )
        return buffer, preds[0], (pending, recon, a_score, a_score.mean())

    return one_point


def _host_only_step(*_args, **_kw):
    raise RuntimeError(
        "this OnlineScorer was built with params=None (host-side threshold/"
        "EWM bookkeeping only, as used by OnlineFleetScorer) — it has no "
        "device state; feed points through the fleet scorer instead"
    )


def atomic_pickle(path: str, obj) -> None:
    """Persist ``obj`` to ``path`` atomically (tmp write + ``os.replace``):
    a crash mid-save can never leave a torn state file. Shared by the solo
    and fleet scorers' ``save_state``."""
    import os
    import pickle

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, path)


class OnlineScorer:
    """Streaming scorer over a trained model.

    Usage::

        scorer = OnlineScorer(model, params, window_size=100, n_features=38)
        scorer.fit_threshold(train_scores, method="epsilon")  # or "spot"
        for x in stream:                       # x: (n_features,)
            out = scorer.update(x)
            if out is not None and out["is_anomaly"]:
                ...

    ``update`` returns None until enough points have arrived (the first
    scoreable point is the (window_size+1)-th, matching the offline scorer's
    ``values[w:]``), then a dict with per-feature and global scores, the
    active threshold, and the alarm flag. ``update_many`` feeds a chunk of K
    points through ONE jitted ``lax.scan`` dispatch (same records, one
    host round-trip per chunk instead of per point — the high-throughput
    serving path).

    ``use_mov_av`` runs ARE served exactly: the offline EWM smoothing
    (pandas ``ewm(span).mean()``, reference ``prediction.py:132-135``) is a
    one-pole recursive filter whose adjust-mode weights depend only on past
    points — pass ``smoothing_span`` and the scorer streams it with two
    scalars of state, record-exact vs the offline ``Predictor._smooth``
    (tested, including the warmup prefix).

    LIMITATION: ``scale_scores=True`` has no causal streaming form (the
    median/IQR are whole-series statistics). A threshold fitted on scaled
    offline train scores would be miscalibrated against the raw streaming
    scores — fit it on raw offline scores (docs/MIGRATION.md).

    Inputs must be on the TRAINING scale: if the model was trained on
    normalized data (the pipeline default), apply the train-fitted
    MinMaxScaler to each incoming point before ``update`` — the ``serve.py``
    CLI does this automatically (cli/serve_cli.py).

    ``params=None`` builds a HOST-ONLY scorer: threshold/EWM/record
    bookkeeping without device buffers or jitted steps — what
    :class:`OnlineFleetScorer` uses per entity while the device work runs
    in its one vmapped scan. ``update``/``update_many`` raise in this mode.
    """

    def __init__(
        self,
        model: MTADGAT,
        params: dict,
        window_size: int,
        n_features: int,
        target_dims: Optional[Sequence[int]] = None,
        gamma: float = 1.0,
        smoothing_span: Optional[int] = None,
    ):
        self.model = model
        self.params = params
        self.window = window_size
        self.n_features = n_features
        self.target_dims = None if target_dims is None else list(target_dims)
        self.gamma = gamma
        if smoothing_span is not None and smoothing_span < 1:
            raise ValueError(f"smoothing_span must be >= 1, got {smoothing_span}")
        self.smoothing_span = smoothing_span
        # pandas ewm(adjust=True) state: (weighted_avg, old_wt); the stream's
        # EWM restarts at the first scoreable record, mirroring the offline
        # smoother running over scores[window:]
        self._ewm_avg: Optional[float] = None
        self._ewm_old_wt = 1.0
        self.out_dim = (
            n_features if self.target_dims is None else len(self.target_dims)
        )

        self._seen = 0
        self._threshold_method: Optional[str] = None
        self._epsilon: Optional[float] = None
        self._spot: Optional[SPOT] = None

        if params is None:
            # host-only mode: OnlineFleetScorer uses one OnlineScorer per
            # entity purely for the threshold/EWM/record bookkeeping — the
            # device ring buffers and the jitted steps live in the fleet's
            # single vmapped scan, so allocating per-entity device buffers
            # here would be dead weight (window 8192 x 28 entities ≈ 35 MB
            # of unused HBM). update()/update_many() raise.
            self._buffer = None
            self._pending_forecast = None
            self._step = self._step_chunk = _host_only_step
            return

        self._buffer = jnp.zeros((window_size, n_features), jnp.float32)
        # device-resident forecast-for-the-next-point (never fetched on its
        # own: it is returned as part of the NEXT step's single fetch)
        self._pending_forecast = jnp.zeros((self.out_dim,), jnp.float32)

        dims = None if self.target_dims is None else jnp.asarray(self.target_dims)
        # one forward per point; scored on-device so ONE host fetch per
        # point retrieves everything (remote-attach round trips dominate
        # serving latency, docs/PERFORMANCE.md)
        one_point = make_one_point(model.apply, dims, gamma)

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, buffer, pending, x):
            return one_point(params, buffer, pending, x)

        @partial(jax.jit, donate_argnums=(1, 2))
        def step_chunk(params, buffer, pending, xs, n_valid):
            # K points per dispatch: the ring buffer + pending forecast are
            # the scan carry, so the chunk is bit-equivalent to K single
            # steps while paying ONE dispatch + ONE host fetch per chunk.
            # n_valid (a traced scalar — changing it does NOT recompile)
            # masks trailing pad rows: their carry updates are discarded, so
            # a partial chunk padded up to the compiled size leaves the ring
            # buffer/pending forecast exactly as the unpadded chunk would.
            def body(carry, inp):
                i, x = inp
                buf, pend = carry
                new_buf, forecast, outs = one_point(params, buf, pend, x)
                valid = i < n_valid
                buf = jnp.where(valid, new_buf, buf)
                forecast = jnp.where(valid, forecast, pend)
                return (buf, forecast), outs

            idx = jnp.arange(xs.shape[0])
            (buffer, pending), outs = jax.lax.scan(
                body, (buffer, pending), (idx, xs)
            )
            return buffer, pending, outs

        self._step = step
        self._step_chunk = step_chunk

    # ------------------------------------------------------------------
    def fit_threshold(
        self,
        train_scores: np.ndarray,
        method: str = "epsilon",
        reg_level: int = 1,
        q: float = 1e-3,
        level: float = 0.98,
        drift_depth: int = 450,
    ) -> None:
        """Arm the alarm from training-split global scores (produced offline
        by ``Predictor.get_score`` or by replaying the train series through
        ``update``). When the run uses ``use_mov_av``, pass SMOOTHED train
        scores — that is what the offline evaluation thresholds on.

        Also restarts the streaming EWM state: the offline smoother runs
        over each split as its own series (reference ``prediction.py:
        132-135`` smooths train and test independently), so a calibration
        replay through ``update_many`` must not leak its EWM state into the
        stream that follows."""
        self._ewm_avg = None
        self._ewm_old_wt = 1.0
        train_scores = np.asarray(train_scores, np.float64)
        if method == "epsilon":
            self._epsilon = float(find_epsilon(train_scores, reg_level=reg_level))
        elif method == "spot":
            spot = SPOT(q)
            # init on the training scores only; the stream arrives via step()
            spot.fit(train_scores, np.empty(0))
            spot.initialize(level=level)
            self._spot = spot
        elif method == "dspot":
            # drift-aware streaming POT (dSPOT.step): subtract a depth-window
            # moving average before thresholding — for streams whose score
            # baseline wanders. No reference serving counterpart (its dSPOT
            # is offline-only and unused by its pipeline, spot.py:1070-1552).
            from mtad_gat_tpu.inference.spot import dSPOT

            if train_scores.size <= drift_depth:
                raise ValueError(
                    f"dspot needs more than drift_depth={drift_depth} "
                    f"calibration scores, got {train_scores.size}"
                )
            dspot = dSPOT(q, drift_depth)
            dspot.fit(train_scores, np.empty(0))
            dspot.initialize()
            self._spot = dspot
        else:
            raise ValueError(
                f"threshold method must be epsilon|spot|dspot, got {method!r}"
            )
        self._threshold_method = method

    # ------------------------------------------------------------------
    def update(self, x: np.ndarray) -> Optional[Dict]:
        """Feed one observation (n_features,); returns the score record for
        this timestep, or None while the window is still filling. One jitted
        dispatch + one host fetch per point."""
        x = jnp.asarray(np.asarray(x, np.float32).reshape(self.n_features))
        scoreable = self._seen >= self.window  # pending forecast is armed
        self._buffer, forecast, outs = self._step(
            self.params, self._buffer, self._pending_forecast, x
        )
        self._seen += 1

        record = None
        if scoreable:
            pending, recon, a_score, global_score = jax.device_get(outs)
            global_score = float(global_score)
            record = {
                "t": self._seen - 1,
                "forecast": pending,
                "recon": recon,
                "a_score": a_score,
                "score": global_score,
            }
            self._finalize(record)

        # forecast emitted by the window ending at this point predicts the
        # NEXT point; hold it ON DEVICE until that point arrives
        self._pending_forecast = forecast
        return record

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict:
        """Serializable streaming state: ring buffer, pending forecast,
        position, EWM scalars, and the armed threshold (epsilon value or
        the SPOT/dSPOT object). With this, a serving process can be killed
        and resumed exactly where it left off (``serve.py --state_file``)
        instead of re-priming from the train tail and re-calibrating.

        The SPOT/dSPOT object is stripped of its run-immutable calibration
        arrays (``init_data``/``data`` — the full train-score series) before
        pickling: state is saved per CHUNK on the serving hot path, and only
        peaks/counters/the drift window actually change per point."""
        spot = self._spot
        if spot is not None:
            import copy

            spot = copy.copy(spot)
            if getattr(spot, "depth", None) is not None and not hasattr(spot, "_W"):
                # dSPOT seeds its drift window lazily from init_data on the
                # first step — materialize it before dropping init_data
                spot._W = np.asarray(
                    spot.init_data[-spot.depth:], dtype=np.float64
                ).copy()
            spot.init_data = None
            spot.data = None
        return {
            "window": self.window,
            "n_features": self.n_features,
            "buffer": None if self._buffer is None else np.asarray(self._buffer),
            "pending": (
                None if self._pending_forecast is None
                else np.asarray(self._pending_forecast)
            ),
            "seen": self._seen,
            "ewm_avg": self._ewm_avg,
            "ewm_old_wt": self._ewm_old_wt,
            "smoothing_span": self.smoothing_span,
            "threshold_method": self._threshold_method,
            "epsilon": self._epsilon,
            "spot": spot,
        }

    def load_state(self, state: Dict) -> None:
        if "scorer" in state and "lines" in state:
            # serve.py state file: scorer state wrapped with the input
            # stream position (cli/serve_cli.py:_save_serving_state) —
            # unwrap so library users can load CLI-produced state too
            state = state["scorer"]
        if (state["window"], state["n_features"]) != (self.window, self.n_features):
            raise ValueError(
                f"state is for window={state['window']}/k={state['n_features']}, "
                f"scorer is window={self.window}/k={self.n_features}"
            )
        if state["smoothing_span"] != self.smoothing_span:
            raise ValueError(
                f"state has smoothing_span={state['smoothing_span']}, "
                f"scorer has {self.smoothing_span}"
            )
        if state["buffer"] is not None:
            self._buffer = jnp.asarray(state["buffer"], jnp.float32)
            self._pending_forecast = jnp.asarray(state["pending"], jnp.float32)
        self._seen = int(state["seen"])
        self._ewm_avg = state["ewm_avg"]
        self._ewm_old_wt = state["ewm_old_wt"]
        self._threshold_method = state["threshold_method"]
        self._epsilon = state["epsilon"]
        self._spot = state["spot"]

    def save_state(self, path: str) -> None:
        """Atomically persist :meth:`state_dict` (write + rename)."""
        atomic_pickle(path, self.state_dict())

    def load_state_file(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            self.load_state(pickle.load(f))

    def _smooth_score(self, score: float) -> float:
        """Streaming EWM, bit-exact to pandas ``ewm(span, adjust=True).mean()``
        (the offline ``Predictor._smooth`` / reference ``prediction.py:132-135``).
        Replicates pandas' exact recursion (pandas ``_libs/window/
        aggregations.pyx::ewm``): carry (weighted_avg, old_wt); per point
        ``old_wt *= 1-alpha``; ``avg = (old_wt*avg + cur) / (old_wt + 1)``
        unless ``avg == cur`` (pandas skips the update to avoid rounding);
        ``old_wt += 1``. NaN observations follow pandas too (ignore_na=False
        default): the weight still decays but the average is NOT blended
        with the NaN — a single bad point must not poison every later score
        (the stream recovers, exactly like the offline smoother)."""
        cur = float(score)
        if self._ewm_avg is None:
            # first point of the stream seeds the average, NaN or not —
            # pandas starts from vals[0] and, if that is NaN, recovers at
            # the first real observation (the elif branch below)
            self._ewm_avg = cur
            self._ewm_old_wt = 1.0
            return self._ewm_avg
        alpha = 2.0 / (self.smoothing_span + 1.0)
        is_obs = cur == cur
        if self._ewm_avg == self._ewm_avg:
            self._ewm_old_wt *= 1.0 - alpha
            if is_obs:
                if self._ewm_avg != cur:
                    self._ewm_avg = (self._ewm_old_wt * self._ewm_avg + cur) / (
                        self._ewm_old_wt + 1.0
                    )
                self._ewm_old_wt += 1.0
        elif is_obs:
            self._ewm_avg = cur
        return self._ewm_avg

    def _finalize(self, record: Dict) -> None:
        if self.smoothing_span is not None:
            record["score_raw"] = record["score"]
            record["score"] = self._smooth_score(record["score"])
        self._apply_threshold(record)

    def _apply_threshold(self, record: Dict) -> None:
        # strict > matches the offline evaluation convention
        # (eval_methods.adjust_predicts: score > threshold)
        if self._threshold_method == "epsilon":
            record["threshold"] = self._epsilon
            record["is_anomaly"] = record["score"] > self._epsilon
        elif self._threshold_method == "spot":
            record["is_anomaly"] = self._spot.step(record["score"])
            record["threshold"] = float(self._spot.extreme_quantile)
        elif self._threshold_method == "dspot":
            record["is_anomaly"] = self._spot.step(record["score"])
            record["threshold"] = float(self._spot.last_threshold)

    def update_many(self, xs: np.ndarray, pad_to: Optional[int] = None) -> list:
        """Feed a chunk of observations (T, n_features) through ONE jitted
        ``lax.scan`` dispatch; returns the list of scoreable records — the
        same records the per-point ``update`` loop would produce (tested),
        at one dispatch + one host fetch per CHUNK. This is the
        high-throughput serving path (measured on hardware in
        docs/PERFORMANCE.md); per-point ``update`` remains the low-latency
        path.

        ``pad_to`` zero-pads a shorter chunk up to that length before the
        dispatch: every chunk then hits the SAME compiled program (XLA
        recompiles per distinct scan length — a live stream's variable
        chunk sizes would otherwise stall mid-stream on multi-second
        compiles). Pad rows are masked out of the carry inside the scan and
        dropped from the returned records, so results are identical to the
        unpadded call (tested)."""
        xs = np.asarray(xs, np.float32).reshape(-1, self.n_features)
        n = xs.shape[0]
        if n == 0:
            return []
        if pad_to is not None:
            if n > pad_to:
                raise ValueError(f"chunk of {n} rows exceeds pad_to={pad_to}")
            if n < pad_to:
                xs = np.concatenate(
                    [xs, np.zeros((pad_to - n, self.n_features), np.float32)]
                )
        start_seen = self._seen
        self._buffer, self._pending_forecast, outs = self._step_chunk(
            self.params, self._buffer, self._pending_forecast,
            jnp.asarray(xs), n,
        )
        self._seen += n
        pendings, recons, a_scores, global_scores = jax.device_get(outs)

        records = []
        for i in range(n):
            t = start_seen + i
            if t < self.window:   # pending forecast not armed yet
                continue
            record = {
                "t": t,
                "forecast": pendings[i],
                "recon": recons[i],
                "a_score": a_scores[i],
                "score": float(global_scores[i]),
            }
            self._finalize(record)
            records.append(record)
        return records
