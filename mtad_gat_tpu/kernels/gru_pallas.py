"""Fused GRU scan — Pallas TPU kernel for the recurrent half.

Reachable via ``MTADGATConfig(gru_impl="pallas")`` / ``--gru_impl pallas``;
off by default because it measures a TIE with the XLA scan on v5e (both are
serial-dependency-bound, docs/PERFORMANCE.md).

The XLA path (``nn/gru.py``) hoists the input projection out of the scan (one
large MXU matmul) and scans only the recurrent update; that is already the
right decomposition, but each `lax.scan` step is a separate fusion with its
own VMEM round-trips for the (b, hid) carry and per-step loop overhead. This
kernel runs the WHOLE scan as one Pallas launch: the carry lives in a VMEM
scratch buffer across sequential grid steps, the (hid, 3*hid) recurrent
weights stay resident, and each step issues three (B, Hp) x (Hp, Hp) MXU
matmuls plus the gate elementwise math — no per-step dispatch, no carry
round-trips.

torch-exact cell semantics (the reference wraps ``nn.GRU``,
``modules.py:220-238``):

    r = sigmoid(gi_r + h W_hr + b_hr)
    z = sigmoid(gi_z + h W_hz + b_hz)
    n = tanh(gi_n + r * (h W_hn + b_hn))
    h' = (1 - z) n + z h

where gi = x W_ih + b_ih is precomputed outside (stays an XLA matmul).

Padding: hid is padded to the 128-lane multiple Hp. Padded columns are stable
at zero through the recurrence: padded W_hh rows/cols and b_hh entries are
zero, so gh_pad = 0, n_pad = tanh(0 + r*0) = 0 and h'_pad = (1-z)*0 + z*0 = 0
given h0_pad = 0.

The backward (BPTT) runs as a second Pallas kernel over the reversed step
grid, recomputing the gates from the saved hidden-state sequence (cheap: one
matmul) and accumulating dW_hh/db_hh in VMEM scratch across steps.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gru_fwd_kernel(gi_ref, whh_ref, bhh_ref, h_ref, h_scr, *, n_steps: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[...] = jnp.zeros_like(h_scr)

    h = h_scr[...]                                   # (B, Hp) f32
    w = whh_ref[...]                                 # (3, Hp, Hp)
    b = bhh_ref[...]                                 # (3, 1, Hp)
    gh_r = jnp.dot(h, w[0], preferred_element_type=jnp.float32) + b[0]
    gh_z = jnp.dot(h, w[1], preferred_element_type=jnp.float32) + b[1]
    gh_n = jnp.dot(h, w[2], preferred_element_type=jnp.float32) + b[2]
    gi = gi_ref[0].astype(jnp.float32)               # (3, B, Hp)
    r = jax.nn.sigmoid(gi[0] + gh_r)
    z = jax.nn.sigmoid(gi[1] + gh_z)
    n = jnp.tanh(gi[2] + r * gh_n)
    h_new = (1.0 - z) * n + z * h
    h_scr[...] = h_new
    h_ref[0] = h_new.astype(h_ref.dtype)


def _gru_bwd_kernel(
    gi_ref, whh_ref, bhh_ref, hseq_ref, hprev_ref, dh_out_ref,
    dgi_ref, dwhh_ref, dbhh_ref,
    dh_scr, dw_scr, db_scr,
    *, n_steps: int,
):
    """Step t (grid runs REVERSED via index_map): consume dh_t (upstream
    cotangent of h_t plus the recurrent carry), emit dgi_t and dh_{t-1}."""
    s = pl.program_id(0)                              # 0 .. n-1, t = n-1-s

    @pl.when(s == 0)
    def _init():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dw_scr[...] = jnp.zeros_like(dw_scr)
        db_scr[...] = jnp.zeros_like(db_scr)

    h_prev = hprev_ref[0].astype(jnp.float32)         # (B, Hp): h_{t-1}
    w = whh_ref[...]
    b = bhh_ref[...]
    gi = gi_ref[0].astype(jnp.float32)                # (3, B, Hp)

    # recompute the gates of step t from h_{t-1}
    gh_r = jnp.dot(h_prev, w[0], preferred_element_type=jnp.float32) + b[0]
    gh_z = jnp.dot(h_prev, w[1], preferred_element_type=jnp.float32) + b[1]
    gh_n = jnp.dot(h_prev, w[2], preferred_element_type=jnp.float32) + b[2]
    r = jax.nn.sigmoid(gi[0] + gh_r)
    z = jax.nn.sigmoid(gi[1] + gh_z)
    n = jnp.tanh(gi[2] + r * gh_n)

    dh = dh_scr[...] + dh_out_ref[0].astype(jnp.float32)   # total dL/dh_t

    dn = dh * (1.0 - z)
    dn_pre = dn * (1.0 - n * n)
    dz = dh * (h_prev - n)
    dz_pre = dz * z * (1.0 - z)
    dr = dn_pre * gh_n
    dr_pre = dr * r * (1.0 - r)
    dghn = dn_pre * r

    dgi_ref[0, 0] = dr_pre.astype(dgi_ref.dtype)
    dgi_ref[0, 1] = dz_pre.astype(dgi_ref.dtype)
    dgi_ref[0, 2] = dn_pre.astype(dgi_ref.dtype)

    # dh_{t-1} = dh*z + sum_g dg @ W_g^T
    dh_prev = (
        dh * z
        + jnp.dot(dr_pre, w[0].T, preferred_element_type=jnp.float32)
        + jnp.dot(dz_pre, w[1].T, preferred_element_type=jnp.float32)
        + jnp.dot(dghn, w[2].T, preferred_element_type=jnp.float32)
    )
    dh_scr[...] = dh_prev

    # weight/bias grads accumulate across steps
    dw_scr[0] += jnp.dot(h_prev.T, dr_pre, preferred_element_type=jnp.float32)
    dw_scr[1] += jnp.dot(h_prev.T, dz_pre, preferred_element_type=jnp.float32)
    dw_scr[2] += jnp.dot(h_prev.T, dghn, preferred_element_type=jnp.float32)
    db_scr[0, 0] += jnp.sum(dr_pre, axis=0)
    db_scr[1, 0] += jnp.sum(dz_pre, axis=0)
    db_scr[2, 0] += jnp.sum(dghn, axis=0)

    @pl.when(s == n_steps - 1)
    def _finalize():
        dwhh_ref[...] = dw_scr[...].astype(dwhh_ref.dtype)
        dbhh_ref[...] = db_scr[...].astype(dbhh_ref.dtype)


def _pack(gi, w_hh, b_hh, H, Hp):
    """gi (b, n, 3H) -> (n, 3, b, Hp); w_hh (H, 3H) -> (3, Hp, Hp);
    b_hh (3H,) -> (3, 1, Hp). Gate order (r, z, n) preserved."""
    b, n, _ = gi.shape
    gi3 = gi.reshape(b, n, 3, H).transpose(1, 2, 0, 3)          # (n, 3, b, H)
    gi3 = jnp.pad(gi3, ((0, 0), (0, 0), (0, 0), (0, Hp - H)))
    w3 = w_hh.reshape(H, 3, H).transpose(1, 0, 2)               # (3, H, H)
    w3 = jnp.pad(w3, ((0, 0), (0, Hp - H), (0, Hp - H)))
    b3 = b_hh.reshape(3, H)[:, None, :]
    b3 = jnp.pad(b3, ((0, 0), (0, 0), (0, Hp - H)))
    return gi3, w3.astype(jnp.float32), b3.astype(jnp.float32)


def _fwd_launch(gi3, w3, b3, B, n, Hp, out_dtype, interpret):
    return pl.pallas_call(
        functools.partial(_gru_fwd_kernel, n_steps=n),
        out_shape=jax.ShapeDtypeStruct((n, B, Hp), out_dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, B, Hp), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((3, Hp, Hp), lambda t: (0, 0, 0)),
            pl.BlockSpec((3, 1, Hp), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, Hp), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((B, Hp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gi3, w3, b3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gru_scan(gi, w_hh, b_hh, hid_dim, interpret):
    hseq, _ = _gru_scan_fwd(gi, w_hh, b_hh, hid_dim, interpret)
    return hseq


def _gru_scan_fwd(gi, w_hh, b_hh, hid_dim, interpret):
    B, n, _ = gi.shape
    H = hid_dim
    Hp = _round_up(H, 128)
    Bp = _round_up(B, 8)
    gi_p = jnp.pad(gi, ((0, Bp - B), (0, 0), (0, 0)))
    gi3, w3, b3 = _pack(gi_p, w_hh, b_hh, H, Hp)
    hseq_p = _fwd_launch(gi3, w3, b3, Bp, n, Hp, jnp.float32, interpret)
    hseq = hseq_p.transpose(1, 0, 2)[:B, :, :]                  # (B, n, Hp)
    return hseq[:, :, :H], (gi3, w3, b3, hseq_p)


def _gru_scan_bwd(hid_dim, interpret, res, dhseq):
    gi3, w3, b3, hseq_p = res
    n, three, Bp, Hp = gi3.shape
    H = hid_dim
    B = dhseq.shape[0]

    # upstream cotangents padded to the kernel layout, reversed in time via
    # the index maps (step s handles t = n-1-s)
    dh_out = jnp.pad(
        dhseq.astype(jnp.float32),
        ((0, Bp - B), (0, 0), (0, Hp - H)),
    ).transpose(1, 0, 2)                                        # (n, Bp, Hp)

    # h_{t-1} sequence: zeros for t=0, else the saved outputs shifted
    hprev = jnp.concatenate(
        [jnp.zeros((1, Bp, Hp), hseq_p.dtype), hseq_p[:-1]], axis=0
    )

    rev = lambda t: n - 1 - t  # noqa: E731

    dgi3, dwhh, dbhh = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, n_steps=n),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((3, Hp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((3, 1, Hp), jnp.float32),
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, Bp, Hp), lambda s: (rev(s), 0, 0, 0)),  # gi
            pl.BlockSpec((3, Hp, Hp), lambda s: (0, 0, 0)),             # w
            pl.BlockSpec((3, 1, Hp), lambda s: (0, 0, 0)),              # b
            pl.BlockSpec((1, Bp, Hp), lambda s: (rev(s), 0, 0)),        # hseq
            pl.BlockSpec((1, Bp, Hp), lambda s: (rev(s), 0, 0)),        # hprev
            pl.BlockSpec((1, Bp, Hp), lambda s: (rev(s), 0, 0)),        # dh_out
        ],
        out_specs=(
            pl.BlockSpec((1, 3, Bp, Hp), lambda s: (rev(s), 0, 0, 0)),
            pl.BlockSpec((3, Hp, Hp), lambda s: (0, 0, 0)),
            pl.BlockSpec((3, 1, Hp), lambda s: (0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((3, Hp, Hp), jnp.float32),
            pltpu.VMEM((3, 1, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gi3, w3, b3, hseq_p, hprev, dh_out)

    # unpack to caller layouts
    dgi = dgi3[:, :, :B, :H].transpose(2, 0, 1, 3).reshape(B, n, 3 * H)
    dw = dwhh[:, :H, :H].transpose(1, 0, 2).reshape(H, 3 * H)
    db = dbhh[:, 0, :H].reshape(3 * H)
    return dgi, dw, db


_gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)


def gru_scan_fused(
    gi: jax.Array,        # (b, n, 3*hid): precomputed x @ W_ih + b_ih
    w_hh: jax.Array,      # (hid, 3*hid)
    b_hh: jax.Array,      # (3*hid,)
    hid_dim: int,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run the recurrent GRU scan in one fused kernel. Returns
    (outputs (b, n, hid) float32, last_hidden (b, hid))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hseq = _gru_scan(gi, w_hh, b_hh, hid_dim, bool(interpret))
    return hseq, hseq[:, -1, :]
