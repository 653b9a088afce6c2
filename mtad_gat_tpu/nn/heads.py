"""Output heads: forecasting MLP and GRU-decoder reconstruction.

Reference semantics:
- ``Forecasting_Model`` (``modules.py:286-311``): Linear(in->hid), then
  (n_layers-1) x Linear(hid->hid), final Linear(hid->out); ReLU + dropout
  between all but the last layer. Note n_layers counts *hidden* transforms, so
  the module holds n_layers+1 Linears.
- ``ReconstructionModel`` (``modules.py:260-283``): repeat h_end window_size
  times, GRU decoder over the repeated sequence, Linear(hid->out) per step.
  (This replaces the paper's VAE — reference README.md:14.)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mtad_gat_tpu.nn.gru import GRU
from mtad_gat_tpu.nn.init import torch_linear_bias, torch_linear_kernel


class _TorchLinear(nn.Module):
    in_dim: int
    out_dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", torch_linear_kernel(self.in_dim), (self.in_dim, self.out_dim)
        )
        bias = self.param("bias", torch_linear_bias(self.in_dim), (self.out_dim,))
        return x @ kernel.astype(self.compute_dtype) + bias.astype(self.compute_dtype)


class ForecastingHead(nn.Module):
    in_dim: int
    hid_dim: int
    out_dim: int
    n_layers: int
    dropout: float
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dims = [self.in_dim] + [self.hid_dim] * self.n_layers + [self.out_dim]
        n_linears = len(dims) - 1
        for i in range(n_linears):
            x = _TorchLinear(
                dims[i], dims[i + 1], self.compute_dtype, name=f"layers_{i}"
            )(x)
            if i < n_linears - 1:
                x = jax.nn.relu(x)
                if self.dropout > 0.0 and not deterministic:
                    rng = self.make_rng("dropout")
                    keep = jax.random.bernoulli(rng, 1.0 - self.dropout, x.shape)
                    x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x


class ReconstructionHead(nn.Module):
    window_size: int
    in_dim: int
    hid_dim: int
    out_dim: int
    n_layers: int
    dropout: float
    compute_dtype: jnp.dtype = jnp.float32
    gru_impl: str = "xla"
    gru_unroll: int = 4

    @nn.compact
    def __call__(self, h_end: jax.Array, deterministic: bool = True) -> jax.Array:
        # h_end: (b, in_dim) -> (b, window, in_dim). The reference does
        # repeat_interleave(window, dim=1).view(b, window, -1) on the 2-D
        # h_end (modules.py:279), which repeats ELEMENTS then reshapes — a
        # scrambled tiling whenever window != in_dim. Replicated exactly
        # because it is load-bearing for activation parity.
        b, d = h_end.shape
        h_rep = jnp.repeat(h_end, self.window_size, axis=1).reshape(
            b, self.window_size, d
        )
        decoder_out, _ = GRU(
            in_dim=self.in_dim,
            hid_dim=self.hid_dim,
            n_layers=self.n_layers,
            dropout=self.dropout,
            compute_dtype=self.compute_dtype,
            impl=self.gru_impl,
            unroll=self.gru_unroll,
            name="decoder",
        )(h_rep, deterministic=deterministic)
        return _TorchLinear(
            self.hid_dim, self.out_dim, self.compute_dtype, name="fc"
        )(decoder_out)
