"""Fleet serving: stream-score E entities per dispatch via ``jax.vmap``.

The TPU-native completion of the serving story: ``sweep.py --batched``
trains a whole SMD fleet as one vmapped step (``training/multi_entity.py``,
stacked ``(E, ...)`` param tree); this module SERVES that fleet the same
way — one jitted dispatch advances every entity's ring buffer and scores
every entity's newest points. At flagship scale that is 28 machines per
chip sharing one compiled program, instead of 28 server processes each
paying their own dispatch and attach latency.

No reference counterpart: the reference has neither serving nor
multi-entity execution (single offline script per entity).

Records are per-entity and match E independent :class:`OnlineScorer`
instances on the same inputs (tested) — vmap changes the batching, not the
math. Thresholding state (epsilon / streaming SPOT / drift-aware dSPOT)
and the EWM smoother are host-side per entity, exactly as in the
single-entity scorer, so all threshold methods compose with fleet serving.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtad_gat_tpu.inference.online import (
    OnlineScorer,
    atomic_pickle,
    make_one_point,
)
from mtad_gat_tpu.models import MTADGAT


class OnlineFleetScorer:
    """Streaming scorer over a TRAINED FLEET (stacked params, one model).

    Usage::

        fleet = OnlineFleetScorer(model, stacked_params, n_entities=E,
                                  window_size=100, n_features=38)
        for e, scores in enumerate(train_scores_per_entity):
            fleet.fit_threshold(e, scores, method="spot")
        records = fleet.update_many(xs)     # xs: (E, T, k)
        # records[e] == the records OnlineScorer would produce for entity e

    ``stacked_params`` is a pytree whose leaves carry a leading entity axis
    (``MultiEntityTrainer.params``, or ``jax.tree.map(lambda *a:
    jnp.stack(a), *per_entity_params)``).
    """

    def __init__(
        self,
        model: MTADGAT,
        stacked_params: dict,
        n_entities: int,
        window_size: int,
        n_features: int,
        target_dims: Optional[Sequence[int]] = None,
        gamma: float = 1.0,
        smoothing_span: Optional[int] = None,
    ):
        self.model = model
        self.params = stacked_params
        self.n_entities = n_entities
        self.window = window_size
        self.n_features = n_features
        self.target_dims = None if target_dims is None else list(target_dims)
        # optional entity labels (e.g. SMD group names); persisted with the
        # state so a resume with a reordered fleet fails instead of silently
        # swapping every entity's ring buffer and threshold state
        self.labels: Optional[List[str]] = None
        self.out_dim = (
            n_features if self.target_dims is None else len(self.target_dims)
        )

        # one host-side scorer per entity carries the threshold/EWM state
        # and the record bookkeeping; the DEVICE work all happens here in
        # the vmapped scan (params=None puts OnlineScorer in host-only
        # mode: no per-entity device buffers or jitted steps are built)
        self._entities: List[OnlineScorer] = [
            OnlineScorer(
                model, None, window_size, n_features,
                target_dims=target_dims, gamma=gamma,
                smoothing_span=smoothing_span,
            )
            for _ in range(n_entities)
        ]

        self._buffers = jnp.zeros(
            (n_entities, window_size, n_features), jnp.float32
        )
        self._pendings = jnp.zeros((n_entities, self.out_dim), jnp.float32)

        dims = None if self.target_dims is None else jnp.asarray(self.target_dims)
        # the solo scorer's per-point step, vmapped over (params, buf,
        # pend, x) — one definition, so fleet records can't drift from solo
        one_point = make_one_point(model.apply, dims, gamma)
        entity_point = jax.vmap(one_point)

        @partial(jax.jit, donate_argnums=(1, 2))
        def step_chunk(params, buffers, pendings, xs, n_valid):
            # xs: (T, E, k) — scan over time, vmap over entities. n_valid is
            # a PER-ENTITY (E,) count: entities advance only through their
            # own valid rows, so UNALIGNED streams (machines emitting at
            # different rates) serve in one dispatch — pad each entity's
            # stream to the common T and mask the rest out of its carry.
            def body(carry, inp):
                i, x = inp
                bufs, pends = carry
                new_bufs, forecasts, outs = entity_point(
                    params, bufs, pends, x
                )
                valid = i < n_valid                       # (E,)
                bufs = jnp.where(valid[:, None, None], new_bufs, bufs)
                forecasts = jnp.where(valid[:, None], forecasts, pends)
                return (bufs, forecasts), outs

            idx = jnp.arange(xs.shape[0])
            (buffers, pendings), outs = jax.lax.scan(
                body, (buffers, pendings), (idx, xs)
            )
            return buffers, pendings, outs

        self._step_chunk = step_chunk

    # ------------------------------------------------------------------
    def fit_threshold(self, entity: int, train_scores, **kw) -> None:
        """Arm entity ``entity``'s alarm (same signature/semantics as
        :meth:`OnlineScorer.fit_threshold`)."""
        self._entities[entity].fit_threshold(train_scores, **kw)

    def update_many(
        self, xs: np.ndarray, pad_to: Optional[int] = None
    ) -> List[List[Dict]]:
        """Feed an ALIGNED chunk ``(E, T, k)`` — T new points for every
        entity — through one vmapped ``lax.scan`` dispatch. Returns
        per-entity record lists, each identical to what that entity's
        standalone :class:`OnlineScorer` would produce (tested)."""
        xs = np.asarray(xs, np.float32)
        if xs.shape[0] != self.n_entities or xs.ndim != 3:
            raise ValueError(
                f"xs must be (n_entities={self.n_entities}, T, "
                f"{self.n_features}), got {xs.shape}"
            )
        return self.update_ragged(list(xs), pad_to=pad_to)

    def update_ragged(
        self, xs_list: List[np.ndarray], pad_to: Optional[int] = None
    ) -> List[List[Dict]]:
        """Feed a RAGGED chunk: ``xs_list[e]`` is ``(T_e, k)`` — each
        entity brings however many points arrived on ITS stream (possibly
        zero). All entities advance together in one dispatch; pad rows are
        masked out of each entity's carry, so results equal feeding each
        entity's stream to its own scorer (tested). ``pad_to`` pins the
        compiled scan length as in :meth:`OnlineScorer.update_many`."""
        if len(xs_list) != self.n_entities:
            raise ValueError(
                f"need {self.n_entities} streams, got {len(xs_list)}"
            )
        xs_list = [
            np.asarray(x, np.float32).reshape(-1, self.n_features)
            for x in xs_list
        ]
        counts = np.array([x.shape[0] for x in xs_list], np.int32)
        T = int(counts.max(initial=0))
        if T == 0:
            return [[] for _ in range(self.n_entities)]
        if pad_to is not None:
            if T > pad_to:
                raise ValueError(f"chunk of {T} rows exceeds pad_to={pad_to}")
            T = pad_to
        xs = np.zeros((self.n_entities, T, self.n_features), np.float32)
        for e, x in enumerate(xs_list):
            xs[e, : x.shape[0]] = x
        start_seen = [ent._seen for ent in self._entities]
        xs_t = jnp.asarray(np.swapaxes(xs, 0, 1))  # (T, E, k)
        self._buffers, self._pendings, outs = self._step_chunk(
            self.params, self._buffers, self._pendings, xs_t,
            jnp.asarray(counts),
        )
        pendings, recons, a_scores, global_scores = jax.device_get(outs)
        # outs time-major: (T, E, ...)

        all_records: List[List[Dict]] = []
        for e in range(self.n_entities):
            ent = self._entities[e]
            records = []
            for i in range(int(counts[e])):
                t = start_seen[e] + i
                ent._seen = t + 1
                if t < self.window:
                    continue
                record = {
                    "t": t,
                    "entity": e,
                    "forecast": pendings[i, e],
                    "recon": recons[i, e],
                    "a_score": a_scores[i, e],
                    "score": float(global_scores[i, e]),
                }
                ent._finalize(record)
                records.append(record)
            all_records.append(records)
        return all_records

    # ------------------------------------------------------------------
    def state_dict(self) -> Dict:
        """Fleet streaming state (device buffers + every entity's host-side
        threshold/EWM state) — the fleet analog of
        :meth:`OnlineScorer.state_dict`."""
        return {
            "n_entities": self.n_entities,
            "window": self.window,
            "n_features": self.n_features,
            "labels": self.labels,
            "smoothing_span": self._entities[0].smoothing_span,
            "buffers": np.asarray(self._buffers),
            "pendings": np.asarray(self._pendings),
            "seen": [ent._seen for ent in self._entities],
            "entities": [
                {
                    k: v
                    for k, v in ent.state_dict().items()
                    if k not in ("buffer", "pending", "seen")
                }
                for ent in self._entities
            ],
        }

    def load_state(self, state: Dict) -> None:
        if "scorer" in state and "lines" in state:
            # serve.py fleet state file: unwrap the stream-position wrapper
            # (cli/serve_cli.py:_save_serving_state)
            state = state["scorer"]
        if (
            state["n_entities"], state["window"], state["n_features"]
        ) != (self.n_entities, self.window, self.n_features):
            raise ValueError(
                "fleet state geometry mismatch: "
                f"{(state['n_entities'], state['window'], state['n_features'])}"
                f" vs {(self.n_entities, self.window, self.n_features)}"
            )
        saved_labels = state.get("labels")
        if saved_labels is not None:
            if self.labels is not None and list(saved_labels) != list(self.labels):
                raise ValueError(
                    f"fleet state is for entities {saved_labels}, scorer has "
                    f"{self.labels} — same entities in the same order required"
                )
            # adopt the saved labels when the scorer has none, so the order
            # guard survives a resume-then-save cycle through the library
            # (a state re-saved with labels=None would strip it permanently)
            self.labels = list(saved_labels)
        saved_span = state.get("smoothing_span")
        if saved_span != self._entities[0].smoothing_span:
            raise ValueError(
                f"fleet state has smoothing_span={saved_span}, scorer has "
                f"{self._entities[0].smoothing_span}"
            )
        self._buffers = jnp.asarray(state["buffers"], jnp.float32)
        self._pendings = jnp.asarray(state["pendings"], jnp.float32)
        for ent, es, sn in zip(self._entities, state["entities"], state["seen"]):
            ent._ewm_avg = es["ewm_avg"]
            ent._ewm_old_wt = es["ewm_old_wt"]
            ent._threshold_method = es["threshold_method"]
            ent._epsilon = es["epsilon"]
            ent._spot = es["spot"]
            ent._seen = int(sn)

    def save_state(self, path: str) -> None:
        atomic_pickle(path, self.state_dict())

    def load_state_file(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            self.load_state(pickle.load(f))
