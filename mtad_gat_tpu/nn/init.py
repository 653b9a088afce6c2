"""Parameter initializers matching the reference's (torch) defaults.

The reference relies on torch's default inits everywhere except the attention
vector ``a`` (xavier-uniform with gain 1.414, reference ``modules.py:57,158``)
and the attention bias matrices (zeros, ``modules.py:60,161``). Matching the
init distributions matters for reproducing the published F1 numbers, since the
reference trains only 10 epochs from these inits.

torch defaults replicated here:
- ``nn.Linear``: weight & bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  (kaiming_uniform(a=sqrt(5)) reduces to that bound for the weight).
- ``nn.Conv1d``: same with fan_in = in_channels * kernel_size.
- ``nn.GRU``: every weight & bias ~ U(-1/sqrt(hidden_size), 1/sqrt(hidden_size)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_kernel(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are (in, out)."""
    return uniform_bound(1.0 / math.sqrt(fan_in))


def torch_linear_bias(fan_in: int):
    return uniform_bound(1.0 / math.sqrt(fan_in))


def xavier_uniform_gain(gain: float):
    """xavier_uniform with an explicit gain (reference ``modules.py:57``)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1] if len(shape) > 1 else 1
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
