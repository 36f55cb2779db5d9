"""Fused SEANet downsample stage as a Pallas TPU kernel.

One XLA-lowered SEANet stage materializes ~6 full-width activations in HBM
(residual conv pair, ELU copies, pad, down conv) — at 24 kHz input widths
that traffic, not FLOPs, bounds the encoder (measured: SEANet is 73% of
encode compute at ~2% MXU utilization; scripts/conv_layout_probe.py). This
kernel computes a whole stage per tile in VMEM:

    y = x + conv1(elu(conv3(elu(x))))      # MimiResnetBlock, k=3 then k=1
    z = downconv_k2s_s(elu(y))             # strided causal downsample

reading x once and writing only the s-times-smaller z. Causality makes the
tile scan sequential: the conv left context (2 columns of x, s columns of
elu(y)) is carried across grid steps in VMEM scratch, so tiles never
overlap and no halo is re-fetched. The strided conv is phase-decomposed
(kernel size 2s = exactly two taps per phase) into 2s small matmuls.

Per-row valid-length masking reproduces the engine's masked semantics
exactly: y and z are zeroed at positions >= valid (equivalent to
model.causal_conv1d's re-zeroing because conv1 is pointwise — no
cross-position leakage between the intermediate zeroings and this one).

All dots run f32 with Precision.HIGHEST, matching the XLA path's
exactness contract. Applicability: num_residual_layers == 1 (dilation 1),
constant pad, kernel sizes (3, 1, 2*stride) — the kyutai/mimi encoder
geometry (transformers MimiEncoder, modeling_mimi.py:444-486).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST


def _elu(x):
    # Mosaic has no expm1 lowering; tanh(x/2)*(exp(x)+1) == expm1(x) and
    # keeps accuracy near 0 (exp(x)-1 would cancel catastrophically there)
    return jnp.where(x > 0, x, jnp.tanh(x * 0.5) * (jnp.exp(x) + 1.0))


def _dot(a, b):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _stage_kernel(
    x_ref,      # (1, C, TT)
    valid_ref,  # (B, 1) int32, whole array in SMEM (per-row blocks violate
                # the TPU (8,128) block rule; indexed by program_id instead)
    w3_ref,     # (3, C2, C)
    b3_ref,     # (C2, 1)
    w1_ref,     # (C, C2)
    b1_ref,     # (C, 1)
    wd_ref,     # (2s, CD, C)
    bd_ref,     # (CD, 1)
    z_ref,      # (1, CD, TO)
    cx_ref,     # scratch (C, 2): last raw-x columns of the previous tile
    cy_ref,     # scratch (C, s): last elu(y) columns of the previous tile
    *,
    stride: int,
    tile_out: int,
):
    t = pl.program_id(1)
    tt = tile_out * stride

    @pl.when(t == 0)
    def _():
        # causal left padding: both convs are constant(0)-padded, and
        # elu(0) == 0, so zero carries are exact at the stream start
        cx_ref[:] = jnp.zeros_like(cx_ref)
        cy_ref[:] = jnp.zeros_like(cy_ref)

    x = x_ref[0]  # (C, TT)
    xc = jnp.concatenate([cx_ref[:], x], axis=1)  # (C, TT+2)
    cx_ref[:] = x[:, tt - 2 :]

    xe = _elu(xc)
    # conv k=3 as 3 shifted matmuls: h[t'] = sum_k W3[k] @ xe[t'-2+k]
    h = _dot(w3_ref[0], xe[:, 0:tt])
    h = h + _dot(w3_ref[1], xe[:, 1 : tt + 1])
    h = h + _dot(w3_ref[2], xe[:, 2 : tt + 2])
    h = _elu(h + b3_ref[:])
    y = x + _dot(w1_ref[:], h) + b1_ref[:]

    # masked semantics: zero positions >= valid (x is already zero there;
    # the conv biases are not)
    v = valid_ref[pl.program_id(0), 0]
    pos = t * tt + jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    y = jnp.where(pos < v, y, 0.0)

    ye = _elu(y)
    yec = jnp.concatenate([cy_ref[:], ye], axis=1)  # (C, TT+s)
    cy_ref[:] = ye[:, tt - stride :]

    # strided causal conv, kernel 2s stride s, left pad s:
    #   z[u] = sum_p Wd[p] @ Y_p[u-1] + Wd[p+s] @ Y_p[u],  Y_p[u] = ye[u*s+p]
    # yec column j is global position (u0-1)*s + j, so Y_p local u index
    # uu reads yec[:, uu*s + p].
    z = jnp.zeros(z_ref.shape[1:], dtype=jnp.float32) + bd_ref[:]
    for p in range(stride):
        yp = jax.lax.slice(yec, (0, p), (yec.shape[0], p + tile_out * stride + 1), (1, stride))
        # yp: (C, TO+1); columns uu = 0..TO correspond to Y_p[u0-1+uu]
        z = z + _dot(wd_ref[p], yp[:, :tile_out])
        z = z + _dot(wd_ref[p + stride], yp[:, 1:])

    vd = -(-v // stride)
    upos = t * tile_out + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where(upos < vd, z, 0.0)
    z_ref[0] = z


def _tile_out_for(c: int, stride: int) -> int:
    """Output-tile width: big lane dims, bounded VMEM (~5 live arrays)."""
    to = (1 << 19) // (c * stride)
    to = max(128, min(1024, to // 128 * 128))
    return to


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def seanet_stage_pallas(
    x: jax.Array,        # (B, C, T) float32
    valid: jax.Array,    # (B,) int32 valid positions of x
    w3: jax.Array,       # (C/2, C, 3)  HF OIH layout
    b3: jax.Array,       # (C/2,)
    w1: jax.Array,       # (C, C/2, 1)
    b1: jax.Array,       # (C,)
    wd: jax.Array,       # (CD, C, 2s)
    bd: jax.Array,       # (CD,)
    stride: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused stage: returns (z (B, CD, T//stride), new_valid (B,))."""
    b, c, t = x.shape
    if t % stride != 0:
        raise ValueError(f"T {t} not divisible by stride {stride}")
    c2 = w3.shape[0]
    cd = wd.shape[0]
    s = stride
    to = _tile_out_for(c, s)
    tt = to * s
    n_t = -(-t // tt)
    t_pad = n_t * tt - t
    if t_pad:
        # zero right-pad: causal convs never let it affect earlier outputs
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad)))

    w3s = jnp.transpose(w3, (2, 0, 1)).astype(jnp.float32)       # (3, C2, C)
    w1m = w1[:, :, 0].astype(jnp.float32)                        # (C, C2)
    wds = jnp.transpose(wd, (2, 0, 1)).astype(jnp.float32)       # (2s, CD, C)

    grid = (b, n_t)
    kernel = functools.partial(_stage_kernel, stride=s, tile_out=to)
    z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, tt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, c2, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * s, cd, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cd, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cd, to), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, cd, n_t * to), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, 2), jnp.float32),
            pltpu.VMEM((c, s), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        valid.astype(jnp.int32)[:, None],
        w3s,
        b3.astype(jnp.float32)[:, None],
        w1m,
        b1.astype(jnp.float32)[:, None],
        wds,
        bd.astype(jnp.float32)[:, None],
    )
    new_valid = -(-valid // stride)
    return z[:, :, : t // s], new_valid


def stage_reference(x, valid, w3, b3, w1, b1, wd, bd, stride):
    """XLA reference of the same stage via model.causal_conv1d — the parity
    oracle for tests."""
    from tokenize_audio_tpu.mimi.model import causal_conv1d, _elu as elu

    residual = x
    h = elu(x)
    h, _ = causal_conv1d(h, valid, w3, b3)
    h = elu(h)
    h, _ = causal_conv1d(h, valid, w1, b1)
    y = residual + h
    if valid is not None:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, y.shape[-1]), 2)
        y = jnp.where(pos < valid[:, None, None], y, 0.0)
    y = elu(y)
    z, nv = causal_conv1d(y, valid, wd, bd, stride=stride)
    return z, nv
