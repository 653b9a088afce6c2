"""1-D temporal convolution front-end.

Semantics of the reference ConvLayer (``modules.py:5-22``): zero-pad the time
axis by (kernel_size-1)//2 on *both* sides, run a full channel-mixing 1-D conv
(k features -> k features), then ReLU. For odd kernels the sequence length is
preserved; for even kernels it shrinks by 1 — we replicate that exactly.

TPU-native notes: implemented as a single ``lax.conv_general_dilated`` in NWC
layout so XLA lowers it onto the MXU as a batched matmul over the kernel taps;
no permutes are needed because we keep (batch, time, features) layout
throughout (the reference permutes twice, ``modules.py:19,22``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mtad_gat_tpu.nn.init import torch_linear_bias, torch_linear_kernel


class TemporalConv(nn.Module):
    n_features: int
    kernel_size: int = 7
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (b, n, k)
        k = self.n_features
        fan_in = k * self.kernel_size
        # kernel layout WIO: (kernel_size, in, out)
        kernel = self.param(
            "kernel", torch_linear_kernel(fan_in), (self.kernel_size, k, k)
        )
        bias = self.param("bias", torch_linear_bias(fan_in), (k,))
        pad = (self.kernel_size - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y + bias.astype(self.compute_dtype)
        return jax.nn.relu(y)
