#!/usr/bin/env python
"""Trace-backed attribution of the flagship train step (VERDICT r4 item #1).

Captures a ``jax.profiler`` device trace of the steady-state epoch scan
(bs 256, bf16, 50 steps per dispatch — the same program ``bench.py`` times),
parses the xplane protobuf at HLO-op granularity, computes EXCLUSIVE (self)
times with async DMA copies separated out, and rolls ops up into model
modules by output-shape signature. Regenerates the "Where the train-step
time goes (traced)" table in docs/PERFORMANCE.md.

Usage::

    python bench_attrib.py                    # capture on the TPU + parse
    python bench_attrib.py /tmp/prof1 [steps] # parse an existing trace dir
                                              # (steps = scan length traced,
                                              # default 50)

The parser needs only the xplane proto schema
(tensorflow.tsl.profiler.protobuf), not the tensorboard profile plugin —
the plugin's native bridge is version-locked to its own TF build.

No reference counterpart: the reference has no profiling beyond wall-clock
epoch times (``training.py:74,158-159``).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys

# Override via env for non-flagship regimes, e.g. the bs-1024 batch-scaling
# attribution in docs/PERFORMANCE.md: ATTRIB_BS=1024 ATTRIB_STEPS=12
NSTEPS = int(os.environ.get("ATTRIB_STEPS", 50))
BS = int(os.environ.get("ATTRIB_BS", 256))


def capture(trace_dir: str) -> None:
    import tempfile
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
    from mtad_gat_tpu.data.windows import batched_starts
    from mtad_gat_tpu.training import Trainer

    cfg = MTADGATConfig(
        n_features=38, window_size=100, out_dim=38, kernel_size=7,
        use_gatv2=True, gru_hid_dim=150, forecast_n_layers=3,
        forecast_hid_dim=150, recon_n_layers=1, recon_hid_dim=150,
        dropout=0.3, alpha=0.2, compute_dtype="bfloat16",
    )
    tcfg = TrainConfig(epochs=1, val_split=0.0, bs=BS, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    n_windows = NSTEPS * BS
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, tcfg, save_path="", log_dir=tmp)
        state = trainer.init_state()
        rng = np.random.default_rng(0)
        series = jnp.asarray(
            rng.standard_normal((n_windows + 200, 38)), jnp.float32
        )
        starts, mask, _ = batched_starts(n_windows, BS)
        state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])  # compile + settle
        t0 = time.perf_counter()
        state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        print(f"steady state: {1000 * dt / NSTEPS:.3f} ms/step wall "
              f"({n_windows / dt:,.0f} windows/s)")
        import jax.profiler

        jax.profiler.start_trace(trace_dir)
        state, out = trainer._epoch_train(state, series, starts, mask)
        np.asarray(out[0])
        jax.profiler.stop_trace()


def module_of(short: str, full: str) -> str:
    """Roll an HLO op into a model module by its output-shape signature,
    batch-size-agnostic (trailing dims identify the module at the flagship
    layer sizes; provenance spot-checked against the op_name metadata in
    the compiled HLO)."""
    sh = re.search(r"= \(?(?:bf16|f32|s32|u32|pred)\[([0-9,]*)\]", full)
    sh = sh.group(1) if sh else ""
    dims = sh.split(",") if sh else []
    tail2 = ",".join(dims[-2:])
    if short.startswith("while"):
        # the outermost while is the epoch scan; inner whiles are GRU scans
        return "scan-loop overhead"
    if "multiply_add_fusion" in short:
        # adam-update fusions are uniquely named; classify BEFORE the shape
        # rules or param-shaped updates (e.g. (150,100), (*,150)) would be
        # misattributed to model modules
        return "adam update"
    if "dynamic-slice" in short or "dynamic-update" in short:
        return "gru scan body (slices)"
    if dims and dims[-1] == "150":
        return "gru scan body (cell fusions)"
    if tail2 in ("100,100", "100,76", "100,38") or sh in ("76", "100,100") \
            or (len(dims) == 2 and dims[-1] == "100"):
        return "temporal GAT"
    if tail2 in ("38,38", "38,200") or sh in ("200", "38,38"):
        return "feature GAT"
    if dims and dims[-1] == "450":
        return "gru input proj / grads"
    if dims and len(dims) == 2 and int(dims[0] or 0) > 10000:
        return "window gather"
    return "other"


def parse(trace_dir: str, nsteps: int = NSTEPS) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(
        glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    )[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    md = plane.event_metadata
    line = next(l for l in plane.lines if l.name == "XLA Ops")
    NS = nsteps

    evs = []
    copies_ps = copy_cnt = 0
    for ev in line.events:
        off, dur = None, ev.duration_ps
        for s in ev.stats:
            nm = plane.stat_metadata[s.metadata_id].name
            if nm == "device_offset_ps":
                off = s.int64_value or s.uint64_value
            elif nm == "device_duration_ps":
                dur = s.int64_value or s.uint64_value
        name = md[ev.metadata_id].name
        m = re.match(r"%(\S+) = ", name)
        short = m.group(1) if m else name[:40]
        if "copy-start" in short or "copy-done" in short:
            # async DMA (param/opt VMEM prefetch): overlapped with compute,
            # and its intervals are NOT nested with the TensorCore stream
            copies_ps += dur
            copy_cnt += 1
            continue
        evs.append((off, dur, name, short))
    evs.sort(key=lambda e: (e[0], -e[1]))

    # TensorCore ops are serialized; whiles are containers. Stack-based
    # exclusive-time computation over the properly-nested remainder.
    excl = collections.Counter()
    cnt = collections.Counter()
    rep_name = {}
    stack = []  # [end, short, child_ps, start]
    def pop():
        end, nm, child, st = stack.pop()
        excl[nm] += (end - st) - child
        cnt[nm] += 1
        if stack:
            stack[-1][2] += end - st

    for off, dur, name, short in evs:
        rep_name.setdefault(short, name)
        while stack and stack[-1][0] <= off:
            pop()
        stack.append([off + dur, short, 0, off])
    while stack:
        pop()

    mods = collections.Counter()
    modcnt = collections.Counter()
    for nm, ps in excl.items():
        m = module_of(nm, rep_name[nm])
        mods[m] += ps
        modcnt[m] += cnt[nm]
    total = sum(excl.values())
    print(f"device busy: {total / 1e9 / NS:.3f} ms/step "
          f"(+async copies {copies_ps / 1e9 / NS:.3f} ms/step "
          f"overlapped, x{copy_cnt / NS:.0f}/step)")
    for m, ps in mods.most_common():
        print(f"{ps / total * 100:6.2f}%  {ps / 1e6 / NS:8.1f} us/step"
              f"  x{modcnt[m] / NS:7.1f}/step  {m}")
    print("\ntop 12 ops by exclusive time:")
    for nm, ps in excl.most_common(12):
        sh = re.search(r"= (\(?[a-z0-9]+\[[0-9,]*\])", rep_name[nm])
        print(f"  {ps / 1e6 / NS:8.2f} us/step x{cnt[nm] / NS:5.1f}"
              f"  {nm}  {sh.group(1) if sh else '?'}")


def main() -> None:
    if len(sys.argv) > 1:
        parse(sys.argv[1],
              int(sys.argv[2]) if len(sys.argv) > 2 else NSTEPS)
        return
    import tempfile

    d = tempfile.mkdtemp(prefix="mtadgat_attrib_")
    capture(d)
    parse(d)


if __name__ == "__main__":
    main()
