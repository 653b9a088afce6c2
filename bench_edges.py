#!/usr/bin/env python
"""SDDMM/softmax/SpMM edges-per-second benchmark (BASELINE.md build-target:
"SDDMM/SpMM edges/s/chip at 1 chip").

Regenerates the dense-XLA vs fused-Pallas table in docs/PERFORMANCE.md: the
complete-graph GATv2 attention forward (scores + softmax + aggregate +
sigmoid) at growing node counts, bf16 inputs, E=256, D=128. Edges/s counts
B * N * N scored edges per forward pass.

Prints one JSON line per (N, path). Modes:

  python bench_edges.py              # TPU table (dense + pallas per N)
  python bench_edges.py --ring       # ring path on the 8-device CPU farm
                                     # (shape/collective validation + per-
                                     # device edges/s; no TPU needed)

The reference has no counterpart (its attention materializes the (b,N,N,2d)
concat tensor, modules.py:97-122, and publishes no perf numbers) — this is
the repo's own north-star metric.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _inputs(B, N, E, D, dtype, jnp):
    r = np.random.default_rng(0)
    return (
        jnp.asarray(r.standard_normal((B, N, E)), dtype),
        jnp.asarray(r.standard_normal((B, N, E)), dtype),
        jnp.asarray(r.standard_normal((E,)), dtype),
        jnp.asarray(r.standard_normal((N, N)), dtype),
        jnp.asarray(r.standard_normal((B, N, D)), dtype),
    )


def _time(fn, args, iters):
    """Time ``iters`` applications inside ONE jitted scan: the remote-attach
    dispatch costs ~1 ms per call, which would swamp small-N measurements.
    A scalar carry multiplied into the first operand serializes iterations."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reps(*xs):
        def body(carry, _):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            return jnp.sum(out, dtype=jnp.float32) * 0.0, None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    np.asarray(reps(*args))  # compile + completion barrier (remote-safe)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = reps(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_tpu_table(cases, iters=20):
    import jax
    import jax.numpy as jnp

    from mtad_gat_tpu.graph.ops import gat_aggregate_dense, gatv2_scores_dense
    from mtad_gat_tpu.kernels.gat_pallas import gatv2_attention_fused

    E, D = 256, 128
    rows = []
    for B, N in cases:
        args = _inputs(B, N, E, D, jnp.bfloat16, jnp)
        edges = B * N * N

        dense = jax.jit(
            lambda p, q, a, bias, v: gat_aggregate_dense(
                gatv2_scores_dense(p, q, a, 0.2), v, bias
            )
        )
        fused = jax.jit(lambda p, q, a, bias, v: gatv2_attention_fused(
            p, q, a, bias, v, 0.2))

        for path, fn in (("dense", dense), ("pallas", fused)):
            dt = _time(fn, args, iters)
            rows.append({
                "metric": "gat_attention_edges_per_sec",
                "path": path, "n_nodes": N, "batch": B,
                "value": round(edges / dt / 1e9, 3), "unit": "Gedges/s",
                "dtype": "bfloat16",
            })
            print(json.dumps(rows[-1]))
    return rows


def bench_crossover(iters=3, nodes=(8192, 16384, 24576, 32768, 40960, 57344, 65536)):
    """The fused Pallas kernel's claimed niche, measured (VERDICT r4 weak
    #6): complete-graph attention at node counts where the dense path's
    (B, N, N) f32 score tensor (plus softmax temporaries) pressures the
    16 GB HBM. B=1, E=256, D=128, bias=None — the O(N²) bias PARAMETER
    would dominate memory for both paths equally, and the model-relevant
    long-axis regime (banded temporal graphs) stores bias banded anyway.
    Reports edges/s and compiler peak HBM per path; a dense OOM is recorded
    as a row with value=null."""
    import jax
    import jax.numpy as jnp

    from mtad_gat_tpu.graph.ops import gat_aggregate_dense, gatv2_scores_dense
    from mtad_gat_tpu.kernels.gat_pallas import gatv2_attention_fused

    E, D, B = 256, 128, 1
    rows = []
    for N in nodes:
        r = np.random.default_rng(0)
        p = jnp.asarray(r.standard_normal((B, N, E)), jnp.bfloat16)
        q = jnp.asarray(r.standard_normal((B, N, E)), jnp.bfloat16)
        a = jnp.asarray(r.standard_normal((E,)), jnp.bfloat16)
        v = jnp.asarray(r.standard_normal((B, N, D)), jnp.bfloat16)
        edges = B * N * N

        dense = jax.jit(lambda p, q, a, v: gat_aggregate_dense(
            gatv2_scores_dense(p, q, a, 0.2), v, None))
        fused = jax.jit(lambda p, q, a, v: gatv2_attention_fused(
            p, q, a, None, v, 0.2))

        for path, fn in (("dense", dense), ("pallas", fused)):
            row = {
                "metric": "gat_attention_crossover",
                "path": path, "n_nodes": N, "batch": B,
                "unit": "Gedges/s", "dtype": "bfloat16",
            }
            try:
                comp = fn.lower(p, q, a, v).compile()
                ma = comp.memory_analysis()
                peak = int(getattr(ma, "peak_memory_in_bytes", 0) or 0) or (
                    ma.argument_size_in_bytes + ma.temp_size_in_bytes
                    + ma.output_size_in_bytes
                )
                row["peak_hbm_gib"] = round(peak / 2**30, 2)
                dt = _time(fn, (p, q, a, v), iters)
                row["value"] = round(edges / dt / 1e9, 3)
            except Exception as e:
                row["value"] = None
                row["error"] = type(e).__name__
                msg = str(e)
                row["oom"] = ("RESOURCE_EXHAUSTED" in msg) or ("emory" in msg)
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def bench_ring_cpu(iters=3):
    """Ring attention on the virtual 8-device CPU farm: validates shapes and
    collectives and reports per-device edges/s (CPU numbers are NOT TPU
    throughput — this mode exists so the ring path's scaling harness runs
    everywhere; on a real multi-chip slice the same code measures ICI)."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mtad_gat_tpu.parallel import make_mesh
    from mtad_gat_tpu.parallel.ring_attention import ring_gatv2_attention

    E, D = 64, 64
    rows = []
    for shards in (2, 4, 8):
        mesh = make_mesh(shards, model_parallel=shards)
        B, N = 2, 512
        p, q, a, bias, v = _inputs(B, N, E, D, jnp.float32, jnp)
        fn = jax.jit(
            lambda p, q, a, bias, v: ring_gatv2_attention(
                p, q, a, bias, v, 0.2, mesh
            )
        )
        dt = _time(fn, (p, q, a, bias, v), iters)
        edges = B * N * N
        rows.append({
            "metric": "ring_attention_edges_per_sec_per_device",
            "path": "ring", "n_nodes": N, "batch": B, "shards": shards,
            "value": round(edges / dt / shards / 1e6, 3),
            "unit": "Medges/s/device", "dtype": "float32",
            "note": "CPU farm validation numbers, not TPU throughput",
        })
        print(json.dumps(rows[-1]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring", action="store_true",
                    help="run the ring path on the 8-device CPU farm")
    ap.add_argument("--crossover", action="store_true",
                    help="dense-vs-pallas memory crossover at large N "
                         "(B=1, no bias; records dense OOM)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.ring:
        bench_ring_cpu()
        return
    if args.crossover:
        bench_crossover(iters=min(args.iters, 3))
        return

    cases = [(8, 128), (8, 512), (4, 2048), (1, 8192)]
    bench_tpu_table(cases, iters=args.iters)


if __name__ == "__main__":
    main()
