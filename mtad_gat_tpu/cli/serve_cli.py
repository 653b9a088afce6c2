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
  measured 5,600+ points/s at chunk 512 over the remote tunnel, >150x
  the per-point rate. Records are identical either way (tested).

Live-stream hygiene: a partially-filled chunk is flushed ``--flush_ms``
(default 1000) after its first row, so a 1 Hz ``tail -f`` stream alarms
within a second instead of waiting for the chunk to fill; partial chunks
are zero-padded up to a small ladder of compiled scan lengths
(1/8/32/chunk, masked in-kernel) so variable chunk sizes never trigger a
mid-stream XLA recompile AND a timer-flushed single row never pays the
full chunk's sequential compute; malformed rows are skipped-and-logged by
default (``--bad_line strict`` to raise instead).

Production extensions (r5): ``--state_file`` persists the full streaming
state (ring buffer, EWM scalars, SPOT/dSPOT threshold state, position —
including the input file's line position) atomically after every chunk and
on exit, and resumes from it on start — a killed server continues exactly
where it left off (tested kill-and-resume bit-identical). Restarting on
the SAME ``--input`` file skips the rows already served (the `tail -f`
file-growth pattern serves appended rows exactly once); a different file
path or stdin streams from its start, so remainder-file resumes keep
working. SIGTERM is masked across each score->write->save section so
a mid-chunk signal can never persist a torn state; on resume the SAME
``--output`` path is appended to, never truncated, and a CLI
``--threshold_method`` differing from the persisted one warns (the state's
method stays active). ``--threshold_method dspot`` arms drift-aware
streaming POT (subtract a ``--drift_depth`` moving average before
thresholding); ``--emit_features K`` adds the top-K per-feature anomaly
scores (original CSV column indices, mapped through target_dims) to each
record for incident triage.

Fleet mode: ``--group 1-1,1-2,...`` with one ``--input`` CSV per group
serves EVERY machine from one process through one vmapped dispatch
(OnlineFleetScorer) — streams are multiplexed with select and may be
UNALIGNED (each dispatch carries whatever each stream brought); per-entity
scalers, thresholds, positions, and the fleet state file all compose, and
records carry a ``group`` field. Records match per-machine solo servers
exactly (tested).

Usage::

    python serve.py --dataset SMD --group 1-1 --model_id -1 \
        --input stream.csv --threshold_method epsilon
    tail -f live.csv | python serve.py --dataset SMD --group 1-1 --input -
    python serve.py --dataset SMD --group 1-1,1-2 \
        --input m11.csv,m12.csv --state_file fleet.state
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from mtad_gat_tpu.cli.args import get_parser
from mtad_gat_tpu.cli.predict_cli import resolve_model_dir
from mtad_gat_tpu.config import RunConfig, lookup_pot_params
from mtad_gat_tpu.data import get_data, get_target_dims


def _train_scores(model_path: str, trainer, x_train, cfg, n_features,
                  target_dims) -> np.ndarray:
    """RAW threshold-calibration scores for the training split. The run's
    cached ``train_output.pkl`` is reused only when its ``A_Score_Global``
    column IS the raw score: with ``scale_scores=True`` the column is
    median/IQR-scaled, and for MSL/SMAP it carries the channel-boundary
    ``adjust_anomaly_scores`` adjustment — neither of which the streaming
    scores have, so using it would miscalibrate the threshold. (EWM
    smoothing is NOT baked into the cache — the reference smooths for
    thresholding but pickles unsmoothed columns, ``prediction.py:132-135``
    vs ``:186-200`` — the caller smooths these raw scores when the run used
    ``use_mov_av``.)"""
    cache_is_raw = not cfg.scale_scores and cfg.dataset not in ("MSL", "SMAP")
    cached = os.path.join(model_path, "train_output.pkl")
    if cache_is_raw and os.path.exists(cached):
        import pandas as pd

        df = pd.read_pickle(cached)
        if "A_Score_Global" in df.columns:
            print(f"Calibrating threshold from cached {cached}")
            return df["A_Score_Global"].to_numpy()
    # sidecar raw-score cache: rescoring the whole training split on every
    # server start (the MSL/SMAP / scale_scores path) is minutes of
    # startup; the raw scores are run-immutable, so persist them once
    sidecar = os.path.join(model_path, "train_scores_raw.npy")
    if os.path.exists(sidecar):
        print(f"Calibrating threshold from cached {sidecar}")
        return np.load(sidecar)
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
    scores = predictor.get_score(x_train)["A_Score_Global"].to_numpy()
    try:
        np.save(sidecar, scores)
    except OSError as e:
        print(f"serve: could not persist {sidecar}: {e}", file=sys.stderr)
    return scores


def _parse_row(line: str, n_features: int, bad_line: str, lineno: int):
    """One CSV row -> (n_features,) float32, or None to skip it. Policy
    ``skip`` logs malformed rows to stderr and keeps serving (a long-running
    server must survive one corrupt line); ``strict`` raises."""
    try:
        vals = np.array(line.split(","), dtype=np.float32)
        if vals.size != n_features:
            raise ValueError(
                f"row has {vals.size} values, model expects {n_features}"
            )
        return vals
    except ValueError as e:
        if bad_line == "strict":
            raise ValueError(f"stream line {lineno}: {e}") from None
        print(f"serve: skipping malformed line {lineno}: {e}", file=sys.stderr)
        return None


def _stream_chunks(source, n_features: int, chunk: int,
                   flush_ms: float = 1000.0, bad_line: str = "skip",
                   skip_lines: int = 0, pos=None):
    """Yield (<=chunk, n_features) float32 arrays from a CSV stream
    ('-' = stdin). A chunk is emitted when `chunk` rows have arrived OR
    `flush_ms` milliseconds after its first row — a slow live stream
    (``tail -f`` at 1 Hz) gets each alarm within the flush window instead
    of waiting for the chunk to fill (round-4 verdict: chunk=128 at 1 Hz
    delayed alarms by up to ~128 s, and a stall held buffered points
    forever).

    Reads the raw fd (``os.read``) with ``select`` timeouts: selecting on a
    buffered file object would sleep while complete lines sit in its
    userspace buffer. Malformed rows follow `bad_line` (skip|strict).

    Crash-resume plumbing: the first ``skip_lines`` input lines are
    consumed without parsing (rows a previous session already served), and
    ``pos`` (a 1-element list, if given) is updated to the absolute line
    number covered by each yielded chunk BEFORE the yield — the serving
    loop persists it with the scorer state so a restart on the same file
    continues at the right line instead of re-scoring from row 0."""
    import select

    fh = sys.stdin if source == "-" else open(source)
    fd = fh.fileno()
    buf = b""
    rows = []
    deadline = None  # monotonic time at which a partial chunk flushes
    eof = False
    lineno = 0
    use_select = flush_ms is not None and flush_ms > 0
    try:
        while True:
            # drain complete lines already in our buffer first
            while b"\n" in buf:
                raw, buf = buf.split(b"\n", 1)
                lineno += 1
                if lineno <= skip_lines:
                    continue
                line = raw.decode(errors="replace").strip()
                if not line:
                    continue
                vals = _parse_row(line, n_features, bad_line, lineno)
                if vals is None:
                    continue
                rows.append(vals)
                if len(rows) == 1 and use_select:
                    deadline = time.monotonic() + flush_ms / 1000.0
                if len(rows) >= chunk:
                    if pos is not None:
                        pos[0] = lineno
                    yield np.stack(rows)
                    rows, deadline = [], None
            if eof:
                break
            if use_select and rows:
                timeout = max(0.0, deadline - time.monotonic())
                ready, _, _ = select.select([fd], [], [], timeout)
                if not ready:
                    if pos is not None:
                        pos[0] = lineno
                    yield np.stack(rows)
                    rows, deadline = [], None
                    continue
            data = os.read(fd, 1 << 16)
            if not data:
                eof = True
                if buf.strip():
                    buf += b"\n"  # terminate a final unterminated line
                continue
            buf += data
        if rows:
            if pos is not None:
                pos[0] = lineno
            yield np.stack(rows)
    finally:
        if fh is not sys.stdin:
            fh.close()


def _stream_chunks_multi(sources, n_features: int, chunk: int,
                         flush_ms: float = 1000.0, bad_line: str = "skip",
                         skip_lines=None, pos=None):
    """Multiplex E CSV streams (one file per entity) into RAGGED chunks:
    yields a list of (T_e, n_features) arrays whenever any stream fills
    ``chunk`` rows or ``flush_ms`` elapses after the first buffered row
    anywhere — one fleet dispatch then serves whatever every entity
    brought (possibly nothing). Select runs over all fds at once; each
    stream keeps its own byte buffer, row buffer, and line counter. A
    stream at EOF simply stops contributing; the generator ends when all
    streams are dry.

    Crash-resume plumbing (as in :func:`_stream_chunks`, per stream):
    ``skip_lines[i]`` input lines of stream i are consumed without
    parsing; ``pos[i]`` (if ``pos``, an E-element list, is given) tracks
    the line number covered by the rows yielded so far from stream i —
    rows still buffered by the burst carry-over are NOT counted."""
    import select

    fhs = []
    try:
        for src in sources:
            fhs.append(open(src))
    except OSError as e:
        for fh in fhs:
            fh.close()
        raise SystemExit(f"serve: cannot open input stream: {e}")
    fds = [fh.fileno() for fh in fhs]
    bufs = [b"" for _ in fhs]
    rows = [[] for _ in fhs]   # per stream: list of (vals, lineno) pairs
    lineno = [0 for _ in fhs]
    eof = [False for _ in fhs]
    skip_lines = skip_lines or [0] * len(fhs)
    deadline = None
    use_select = flush_ms is not None and flush_ms > 0

    def drain(i):
        while b"\n" in bufs[i]:
            raw, bufs[i] = bufs[i].split(b"\n", 1)
            lineno[i] += 1
            if lineno[i] <= skip_lines[i]:
                continue
            line = raw.decode(errors="replace").strip()
            if not line:
                continue
            vals = _parse_row(line, n_features, bad_line, lineno[i])
            if vals is None:
                continue
            rows[i].append((vals, lineno[i]))

    def flush():
        # at most `chunk` rows per stream per dispatch (a burst read can
        # deliver a whole file at once); the remainder stays buffered and
        # the while-loop yields again immediately
        nonlocal deadline
        out = []
        for i, r in enumerate(rows):
            take = r[:chunk]
            out.append(
                np.stack([v for v, _ in take]) if take
                else np.zeros((0, n_features), np.float32)
            )
            if take and pos is not None:
                pos[i] = take[-1][1]
            del r[:chunk]
        deadline = None
        return out

    try:
        while True:
            if any(len(r) >= chunk for r in rows):
                yield flush()
                continue
            live = [fd for fd, e in zip(fds, eof) if not e]
            if not live:
                while any(rows):      # flush() caps at `chunk` per stream
                    yield flush()
                break
            timeout = None
            if use_select and any(rows):
                if deadline is None:
                    deadline = time.monotonic() + flush_ms / 1000.0
                timeout = max(0.0, deadline - time.monotonic())
            ready, _, _ = select.select(live, [], [], timeout)
            if not ready:
                yield flush()
                continue
            for fd in ready:
                i = fds.index(fd)
                data = os.read(fd, 1 << 16)
                if not data:
                    eof[i] = True
                    if bufs[i].strip():
                        bufs[i] += b"\n"  # terminate a final ragged line
                else:
                    bufs[i] += data
                drain(i)
    finally:
        for fh in fhs:
            fh.close()


def _bucket_ladder(chunk: int):
    """Padding buckets shared by solo and fleet serving: a timer-flushed
    1-row chunk on a chunk-128 server must not pay 128 sequential forwards —
    pad up to the smallest bucket instead. Each bucket compiles once
    (lazily; the persistent compile cache makes later sessions free), full
    chunks still hit one program."""
    buckets = sorted({b for b in (1, 8, 32, chunk) if b <= chunk})

    def bucket_for(n: int) -> int:
        return next(b for b in buckets if b >= n)

    return bucket_for


def _record_json(rec, emit_features: int, feat_index=None) -> dict:
    """The JSONL record surface shared by solo and fleet serving.
    ``feat_index`` maps a_score positions back to original CSV column
    indices (target-dims runs); None = identity."""
    out = {
        "t": int(rec["t"]),
        "score": float(rec["score"]),
        "threshold": float(rec["threshold"]),
        "is_anomaly": bool(rec["is_anomaly"]),
    }
    if emit_features > 0:
        a = np.asarray(rec["a_score"])
        top = np.argsort(a)[::-1][:emit_features]
        out["top_features"] = [
            [int(i) if feat_index is None else feat_index[int(i)], float(a[i])]
            for i in top
        ]
    return out


def _warn_resumed_method(active: str, requested, state_file: str) -> None:
    # requested is None when --threshold_method was not given: a plain
    # restart must not warn that a never-made request is being ignored
    if requested is not None and active != requested:
        print(
            f"serve: WARNING — resumed state carries threshold_method="
            f"{active!r}, which stays active; the requested "
            f"--threshold_method {requested!r} is ignored (delete "
            f"{state_file} to re-calibrate).",
            file=sys.stderr,
        )


def _open_sink(output: str, resumed: bool):
    # resuming with the same --output must APPEND: truncating would destroy
    # every record emitted before the crash while the scorer resumes past
    # them (they could never be regenerated)
    return sys.stdout if output == "-" else open(output, "a" if resumed else "w")


def _save_serving_state(scorer_obj, path: str, input_id, lines) -> None:
    """Persist the scorer state PLUS the input-stream position in one
    atomic write: resuming with the same file ``--input`` must skip the
    rows already served (re-reading the file from row 0 would re-score
    every point as new timesteps and corrupt the threshold state). The
    scorer state and the position live in the same pickle so a kill can
    never tear one from the other."""
    from mtad_gat_tpu.inference.online import atomic_pickle

    atomic_pickle(
        path, {"scorer": scorer_obj.state_dict(), "input": input_id,
               "lines": lines}
    )


def _load_serving_state(scorer_obj, path: str):
    """Counterpart of :func:`_save_serving_state`; also loads state files
    from before the position wrapper existed (raw scorer dicts). Returns
    ``(input_id, lines)`` — ``(None, None)`` for old-format files."""
    import pickle

    with open(path, "rb") as f:
        st = pickle.load(f)
    if isinstance(st, dict) and "scorer" in st and "lines" in st:
        scorer_obj.load_state(st["scorer"])
        return st.get("input"), st.get("lines")
    scorer_obj.load_state(st)
    return None, None


def _resume_skip_lines(saved_input, saved_lines, current_input, label="") -> int:
    """Lines of ``current_input`` to fast-forward on resume: only when the
    saved state was produced from the SAME file path (the remainder-file
    pattern — new file with only new rows — naturally restarts at 0, and
    stdin callers control their own stream)."""
    if (
        saved_input == current_input and saved_lines
        and current_input != "-"
    ):
        print(
            f"serve: resuming {current_input}{label} at line "
            f"{int(saved_lines) + 1} (rows served before the restart are "
            f"skipped)", file=sys.stderr,
        )
        return int(saved_lines)
    return 0


def _serve_loop(chunks, score_chunk, sink, save_state) -> tuple:
    """The serving protocol shared by solo and fleet modes. For every chunk
    from the stream: block SIGTERM across the score->write->save section (an
    exception at an arbitrary point inside would persist a TORN state — ring
    buffer advanced, EWM/SPOT partially applied — or drop scored records;
    the pending signal fires at the unblock, between chunks, where the state
    is consistent by construction), write one JSONL record per scoreable
    point, persist streaming state per chunk and once more on exit if the
    last chunk's save did not happen.

    ``score_chunk(batch)`` feeds the batch to the scorer and yields
    fully-decorated record dicts; ``save_state`` is a zero-arg callable or
    None. Returns ``(points_served, alarms)``."""
    import signal

    n_pts = n_alarms = 0
    state_dirty = False
    try:
        for batch in chunks:
            signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGTERM})
            try:
                for out in score_chunk(batch):
                    n_pts += 1
                    n_alarms += bool(out.get("is_anomaly"))
                    sink.write(json.dumps(out) + "\n")
                sink.flush()
                state_dirty = True
                if save_state is not None:
                    save_state()
                    state_dirty = False
            finally:
                signal.pthread_sigmask(signal.SIG_UNBLOCK, {signal.SIGTERM})
    finally:
        if save_state is not None and state_dirty:
            save_state()
        if sink is not sys.stdout:
            sink.close()
    return n_pts, n_alarms


def _fleet_main(args) -> None:
    """Fleet serving: one process streams EVERY group's machine through one
    vmapped dispatch (``--group 1-1,1-2,...`` + matching comma-separated
    ``--input`` files). Each entity keeps its own scaler, threshold
    calibration, stream position, and flush buffer; chunks are RAGGED —
    machines emit at different rates and each dispatch carries whatever
    each stream brought (OnlineFleetScorer.update_ragged)."""
    import jax
    import jax.numpy as jnp

    groups = [g.strip() for g in args.group.split(",")]
    sources = [s.strip() for s in args.input.split(",")]
    if len(sources) != len(groups):
        raise SystemExit(
            f"--input must list one CSV per group ({len(groups)} groups, "
            f"{len(sources)} inputs)"
        )
    if "-" in sources:
        raise SystemExit(
            "fleet mode multiplexes one FILE per group; '-' (stdin) is "
            "only supported in single-group mode"
        )
    if args.dataset != "SMD":
        raise SystemExit("fleet serving is per-machine: --dataset SMD only")

    from mtad_gat_tpu.data.loading import normalize_data
    from mtad_gat_tpu.inference import OnlineFleetScorer
    from mtad_gat_tpu.training import Trainer

    E = len(groups)
    resumed = bool(args.state_file and os.path.exists(args.state_file))
    per_params, scalers, thresholds, model = [], [], [], None
    cfg0 = None
    for g in groups:
        output_path = os.path.join(args.output_root, "SMD", g)
        model_path = resolve_model_dir(output_path, args.model_id)
        cfg = RunConfig.load(os.path.join(model_path, "config.txt"))
        if cfg0 is None:
            cfg0 = cfg
        elif cfg.model_config(1, 1) != cfg0.model_config(1, 1):
            raise SystemExit(
                f"fleet serving stacks params via vmap: group {g}'s model "
                f"config differs from group {groups[0]}'s — serve it solo "
                f"or retrain with matching hyper-parameters"
            )
        elif (cfg.gamma, cfg.use_mov_av, cfg.scale_scores, cfg.normalize) != (
            cfg0.gamma, cfg0.use_mov_av, cfg0.scale_scores, cfg0.normalize
        ):
            # the fleet scores every entity with cfg0's gamma/smoothing; a
            # mismatched group's threshold would be calibrated on a
            # different scale than its streaming scores — refuse loudly
            raise SystemExit(
                f"fleet serving shares scoring parameters: group {g}'s "
                f"gamma/use_mov_av/scale_scores/normalize differ from group "
                f"{groups[0]}'s — serve it solo"
            )
        if cfg.scale_scores:
            print(
                f"serve: WARNING — group {g} used scale_scores=True; the "
                "stream is scored and calibrated on RAW scores (see "
                "OnlineScorer docstring).", file=sys.stderr,
            )
        entity = f"machine-{g}"
        (x_train, _), _ = get_data(
            entity, data_root=args.data_root, normalize=cfg.normalize
        )
        scaler = None
        if cfg.normalize:
            (raw_train, _), _ = get_data(
                entity, data_root=args.data_root, normalize=False
            )
            _, scaler = normalize_data(raw_train)
        n_features = x_train.shape[1]
        trainer = Trainer(
            cfg.model_config(n_features, n_features), cfg.train_config(),
            save_path=model_path, log_dir=os.path.join(model_path, "logs"),
        )
        trainer.load(os.path.join(model_path, "model.msgpack"))
        if model is None:
            model = trainer.model
        per_params.append(trainer.state.params)
        scalers.append(scaler)
        if not resumed:
            # resume restores thresholds/positions from the state file —
            # don't pay E entities' worth of calibration scoring on restart
            scores = _train_scores(
                model_path, trainer, x_train, cfg, n_features, None
            )
            level, q, reg_level = lookup_pot_params(
                "SMD", g, cfg.level, cfg.q
            )
            thresholds.append(dict(
                train_scores=scores, method=args.threshold_method,
                reg_level=reg_level, q=q, level=level,
                drift_depth=args.drift_depth,
            ))
        tails = x_train[-cfg.lookback:]
        per_params[-1] = (per_params[-1], tails)  # carry tail alongside

    stacked = jax.tree.map(
        lambda *a: jnp.stack(a), *[p for p, _ in per_params]
    )
    tails = [t for _, t in per_params]
    n_features = tails[0].shape[1]
    span = None
    if cfg0.use_mov_av:
        from mtad_gat_tpu.inference.predictor import smoothing_span

        span = smoothing_span(cfg0.lookback)
    fleet = OnlineFleetScorer(
        model, stacked, E, cfg0.lookback, n_features, gamma=cfg0.gamma,
        smoothing_span=span,
    )
    fleet.labels = list(groups)
    chunk = max(1, args.chunk)
    bucket_for = _bucket_ladder(chunk)

    skips = [0] * E
    stream_pos = [0] * E
    if resumed:
        saved_input, saved_lines = _load_serving_state(fleet, args.state_file)
        if isinstance(saved_input, (list, tuple)) and saved_lines:
            for e, src in enumerate(sources):
                if e < len(saved_input):
                    skips[e] = _resume_skip_lines(
                        saved_input[e], saved_lines[e], src,
                        label=f" ({groups[e]})",
                    )
        stream_pos = list(skips)
        active = fleet._entities[0]._threshold_method
        _warn_resumed_method(
            active, args.threshold_method_given, args.state_file
        )
        print(f"Fleet serving: resumed {E} entities from {args.state_file} "
              f"(threshold={active})", file=sys.stderr)
    else:
        for e, th in enumerate(thresholds):
            scores = th.pop("train_scores")
            if span is not None:
                # calibrate on SMOOTHED train scores (prediction.py:158-163)
                from mtad_gat_tpu.inference.predictor import smooth_scores

                scores = smooth_scores(scores, span)
            fleet.fit_threshold(e, scores, **th)
        # prime every window with the train tails, in bucket-padded chunks
        # so serving reuses the compiled programs (a one-off full-lookback
        # vmapped scan would be a dead multi-second compile at long windows)
        prime = np.stack(tails)  # (E, lookback, k)
        for i in range(0, prime.shape[1], chunk):
            n = min(chunk, prime.shape[1] - i)
            fleet.update_many(prime[:, i:i + n], pad_to=bucket_for(n))
        print(f"Fleet serving: {E} entities primed; chunk={chunk}, "
              f"threshold={args.threshold_method}", file=sys.stderr)

    def score_chunk(batches):
        prepared = []
        for e, b in enumerate(batches):
            if scalers[e] is not None and b.shape[0]:
                b = scalers[e].transform(
                    np.nan_to_num(np.asarray(b, np.float32))
                )
            prepared.append(b)
        longest = max(b.shape[0] for b in prepared)
        recs = fleet.update_ragged(prepared, pad_to=bucket_for(max(1, longest)))
        for e, group_recs in enumerate(recs):
            for rec in group_recs:
                yield {
                    "group": groups[e],
                    **_record_json(rec, args.emit_features),
                }

    sink = _open_sink(args.output, resumed)
    save_state = (
        (lambda: _save_serving_state(
            fleet, args.state_file, list(sources), list(stream_pos)
        ))
        if args.state_file else None
    )
    n_pts, n_alarms = _serve_loop(
        _stream_chunks_multi(
            sources, n_features, chunk,
            flush_ms=args.flush_ms, bad_line=args.bad_line,
            skip_lines=skips, pos=stream_pos,
        ),
        score_chunk, sink, save_state,
    )
    print(f"Served {n_pts} points, {n_alarms} alarms across {E} entities.",
          file=sys.stderr)


def main() -> None:
    # A long-running server is stopped with SIGTERM (systemd, docker stop,
    # plain `kill`): convert it into SystemExit so the finally-block below
    # persists the streaming state before the process dies. (SIGKILL still
    # loses at most the current chunk — state is also saved per chunk.)
    import signal

    def _sigterm(_signum, _frame):
        sys.exit(143)

    try:
        signal.signal(signal.SIGTERM, _sigterm)
    except ValueError:
        pass  # not the main thread (e.g. embedded use) — skip the handler

    parser = get_parser()
    parser.add_argument("--model_id", type=str, default="-1",
                        help="datetime run id, or -N for the N-th latest run")
    parser.add_argument("--input", type=str, default="-",
                        help="CSV stream of observations (one point per "
                             "line, n_features comma-separated values); "
                             "'-' = stdin")
    parser.add_argument("--output", type=str, default="-",
                        help="JSONL records destination; '-' = stdout")
    parser.add_argument("--threshold_method", type=str, default=None,
                        choices=["epsilon", "spot", "dspot"],
                        help="alarm: fixed Hundman epsilon from train "
                             "scores (the default), streaming POT (GPD "
                             "tail re-fit per peak), or drift-aware "
                             "streaming POT (dspot: subtracts a "
                             "--drift_depth moving average first — for "
                             "wandering score baselines). On resume the "
                             "state file's method stays active; passing "
                             "this flag alongside a differing state warns")
    parser.add_argument("--drift_depth", type=int, default=450,
                        help="dspot drift-window depth (points of moving "
                             "average subtracted before thresholding)")
    parser.add_argument("--state_file", type=str, default="",
                        help="persist streaming state (ring buffer, EWM, "
                             "threshold/SPOT state, stream position) here "
                             "on exit and resume from it on start: a "
                             "killed server continues exactly where it "
                             "left off instead of re-priming and "
                             "re-calibrating; restarting on the same "
                             "--input FILE skips rows already served")
    parser.add_argument("--emit_features", type=int, default=0,
                        help="include the top-K per-feature anomaly scores "
                             "in each record as [feature_index, score] "
                             "pairs (incident triage; 0 = global only)")
    parser.add_argument("--chunk", type=int, default=128,
                        help="points per jitted dispatch (1 = lowest "
                             "latency; larger = higher throughput)")
    parser.add_argument("--flush_ms", type=float, default=1000.0,
                        help="flush a partially-filled chunk this many ms "
                             "after its first row, so slow live streams "
                             "alarm promptly (0 = only flush full chunks / "
                             "EOF)")
    parser.add_argument("--bad_line", type=str, default="skip",
                        choices=["skip", "strict"],
                        help="malformed stream rows: skip-and-log (keep "
                             "serving) or strict (raise)")
    args = parser.parse_args()
    # remember whether --threshold_method was actually given (None = not):
    # the resume warning must not claim a never-made request is ignored
    args.threshold_method_given = args.threshold_method
    if args.threshold_method is None:
        args.threshold_method = "epsilon"
    from mtad_gat_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(getattr(args, "compile_cache", "default"))

    if "," in args.group:
        # fleet mode: --group 1-1,1-2,... with one --input CSV per group
        return _fleet_main(args)

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

    # Serve use_mov_av runs exactly: the offline EWM smoothing streams
    # (OnlineScorer._smooth_score), span per reference prediction.py:132-135
    span = None
    if cfg.use_mov_av:
        from mtad_gat_tpu.inference.predictor import smoothing_span

        span = smoothing_span(cfg.lookback)
    if cfg.scale_scores:
        print(
            "serve: WARNING — this run used scale_scores=True; the offline "
            "median/IQR scaling has no causal streaming form, so the stream "
            "is scored AND the threshold is calibrated on RAW scores "
            "(see OnlineScorer docstring).",
            file=sys.stderr,
        )
    scorer = OnlineScorer(
        trainer.model, trainer.state.params, cfg.lookback, n_features,
        target_dims=target_dims, gamma=cfg.gamma,
        smoothing_span=span,
    )
    chunk = max(1, args.chunk)
    bucket_for = _bucket_ladder(chunk)

    resumed = bool(args.state_file and os.path.exists(args.state_file))
    skip = 0
    stream_pos = [0]
    if resumed:
        # crash/restart resume: ring buffer + EWM + threshold/SPOT state +
        # position restored exactly; no re-priming, no re-calibration
        saved_input, saved_lines = _load_serving_state(scorer, args.state_file)
        skip = _resume_skip_lines(saved_input, saved_lines, args.input)
        stream_pos[0] = skip
        _warn_resumed_method(
            scorer._threshold_method, args.threshold_method_given,
            args.state_file,
        )
        print(f"Serving: resumed streaming state from {args.state_file} "
              f"(t={scorer._seen}, threshold={scorer._threshold_method}); "
              f"chunk={chunk}", file=sys.stderr)
    else:
        train_scores = _train_scores(
            model_path, trainer, x_train, cfg, n_features, target_dims
        )
        if span is not None:
            # calibrate on SMOOTHED train scores — what the offline eval
            # thresholds on (reference prediction.py:158-163)
            from mtad_gat_tpu.inference.predictor import smooth_scores

            train_scores = smooth_scores(train_scores, span)
        level, q, reg_level = lookup_pot_params(
            dataset, args.group, cfg.level, cfg.q
        )
        scorer.fit_threshold(
            train_scores, method=args.threshold_method,
            reg_level=reg_level, q=q, level=level,
            drift_depth=args.drift_depth,
        )

        # warm the window with the tail of the training series so the
        # stream is scoreable from its first point (the model has seen this
        # data); feed it in padded chunks so serving reuses the programs
        prime = x_train[-cfg.lookback:]
        for i in range(0, prime.shape[0], chunk):
            n = min(chunk, prime.shape[0] - i)
            scorer.update_many(prime[i:i + chunk], pad_to=bucket_for(n))
        print(f"Serving: window primed with the last {cfg.lookback} train "
              f"points; chunk={chunk}, threshold={args.threshold_method}",
              file=sys.stderr)

    # feature indices for --emit_features: a_score is in target-dims space
    # (MSL/SMAP score only their telemetry channel) — map back to the
    # stream's CSV column indices for triage
    feat_index = (
        list(range(n_features)) if target_dims is None else list(target_dims)
    )

    def score_chunk(batch):
        if scaler is not None:
            batch = scaler.transform(np.nan_to_num(np.asarray(batch, np.float32)))
        for rec in scorer.update_many(batch, pad_to=bucket_for(len(batch))):
            yield _record_json(rec, args.emit_features, feat_index)

    sink = _open_sink(args.output, resumed)
    save_state = (
        (lambda: _save_serving_state(
            scorer, args.state_file, args.input, stream_pos[0]
        ))
        if args.state_file else None
    )
    n_pts, n_alarms = _serve_loop(
        _stream_chunks(args.input, n_features, chunk,
                       flush_ms=args.flush_ms, bad_line=args.bad_line,
                       skip_lines=skip, pos=stream_pos),
        score_chunk, sink, save_state,
    )
    print(f"Served {n_pts} points, {n_alarms} alarms.", file=sys.stderr)


if __name__ == "__main__":
    main()
