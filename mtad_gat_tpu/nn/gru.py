"""GRU encoder/decoder as a ``lax.scan`` over fused gate matmuls.

Matches torch ``nn.GRU`` cell semantics exactly (the reference wraps it at
``modules.py:220-238`` for the encoder and ``modules.py:241-257`` for the
decoder):

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

with gate order (r, z, n) in the packed weights, torch-default
U(-1/sqrt(hid), 1/sqrt(hid)) init for every weight and bias, and inter-layer
dropout only when n_layers > 1 (the reference forces dropout to 0 for a single
layer, ``modules.py:232,252``).

TPU-native notes: the three gates are computed with ONE (in+hid) x 3*hid
matmul per step per layer — the input-to-hidden half for the whole sequence is
hoisted out of the scan and computed as a single large MXU matmul over
(b*n, in); only the recurrent half runs inside the scan. The scan carries a
single (b, hid) state per layer; XLA unrolls/pipelines it.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mtad_gat_tpu.nn.init import uniform_bound


class GRU(nn.Module):
    """Multi-layer batch-first GRU. Returns (outputs, last_hidden) where
    outputs is (b, n, hid) from the last layer and last_hidden is (b, hid) —
    the only thing the reference actually consumes downstream
    (``mtad_gat.py:73-74``; its ``out[-1]`` indexing bug makes the sequence
    output unused)."""

    in_dim: int
    hid_dim: int
    n_layers: int = 1
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    # lax.scan unroll factor: amortizes per-step loop overhead on TPU by
    # emitting `unroll` timesteps per loop iteration (math unchanged).
    # Measured on v5e (docs/PERFORMANCE.md): 4 is the fwd+bwd sweet spot
    # (1 leaves loop overhead on the table; >8 slows the backward).
    unroll: int = 4
    # Whether the caller needs the full (b, n, hid) sequence output. The
    # encoder use (mtad_gat.py) consumes only last_hidden — the reference's
    # ``out[-1]`` indexing bug makes its sequence output dead (modules.py:237)
    # — so skipping the stacked ys saves an (n, b, hid) HBM write per layer.
    collect_outputs: bool = True
    # Recurrent-scan implementation: "xla" (lax.scan, the default) or
    # "pallas" (kernels/gru_pallas.py: whole scan in one fused launch, carry
    # resident in VMEM). Measured on v5e the two tie — both are bounded by
    # the serial step dependency (docs/PERFORMANCE.md) — so pallas is opt-in.
    impl: str = "xla"

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        # x: (b, n, in_dim)
        cd = self.compute_dtype
        h = x.astype(cd)
        bound = 1.0 / math.sqrt(self.hid_dim)
        init = uniform_bound(bound)
        last_hidden = None
        eff_dropout = 0.0 if self.n_layers == 1 else self.dropout

        for layer in range(self.n_layers):
            in_dim = self.in_dim if layer == 0 else self.hid_dim
            # intermediate layers always need the full sequence; only the
            # last layer's ys can be elided
            collect = self.collect_outputs or layer < self.n_layers - 1
            # packed gate order (r, z, n); stored (in, 3h) for right-matmul
            w_ih = self.param(f"w_ih_l{layer}", init, (in_dim, 3 * self.hid_dim))
            w_hh = self.param(f"w_hh_l{layer}", init, (self.hid_dim, 3 * self.hid_dim))
            b_ih = self.param(f"b_ih_l{layer}", init, (3 * self.hid_dim,))
            b_hh = self.param(f"b_hh_l{layer}", init, (3 * self.hid_dim,))

            # Hoist the input projection out of the scan: one big MXU matmul.
            gi = h @ w_ih.astype(cd) + b_ih.astype(cd)          # (b, n, 3h)

            if self.impl == "pallas":
                from mtad_gat_tpu.kernels.gru_pallas import gru_scan_fused

                hseq, last_hidden = gru_scan_fused(
                    gi, w_hh, b_hh, self.hid_dim
                )
                last_hidden = last_hidden.astype(cd)
                h = hseq.astype(cd) if collect else None
            else:
                gi = jnp.swapaxes(gi, 0, 1)                      # (n, b, 3h)

                def step(carry, gi_t, w_hh=w_hh, b_hh=b_hh, collect=collect):
                    gh = carry @ w_hh.astype(cd) + b_hh.astype(cd)  # (b, 3h)
                    i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                    r = jax.nn.sigmoid(i_r + h_r)
                    z = jax.nn.sigmoid(i_z + h_z)
                    n = jnp.tanh(i_n + r * h_n)
                    new = (1.0 - z) * n + z * carry
                    return new, new if collect else None

                h0 = jnp.zeros((h.shape[0], self.hid_dim), cd)
                last_hidden, outs = jax.lax.scan(
                    step, h0, gi, unroll=self.unroll
                )
                if collect:
                    h = jnp.swapaxes(outs, 0, 1)                 # (b, n, h)
                else:
                    h = None

            if (
                collect and eff_dropout > 0.0 and not deterministic
                and layer < self.n_layers - 1
            ):
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1.0 - eff_dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - eff_dropout), 0.0)

        return h, last_hidden
