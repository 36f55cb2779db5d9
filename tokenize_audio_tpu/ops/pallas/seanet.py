"""Fused SEANet residual block as a Pallas TPU kernel.

One XLA-lowered SEANet stage materializes ~6 full-width activations in HBM
(ELU copies, the residual conv pair, pad buffers) — at 24 kHz widths that
traffic, not FLOPs, bounds the encoder (measured: SEANet is 73% of encode
compute at ~2% MXU utilization; scripts/conv_layout_probe.py). This kernel
computes, per VMEM tile,

    ye = elu(x + conv1(elu(conv3(elu(x)))))     # MimiResnetBlock + next ELU

reading x once and writing ye once; the stage's strided downsample conv
then runs in XLA on ye (it reads full-width once and writes the s-times
smaller output — Mosaic cannot express stride-s lane slices, so fusing it
buys little over this split). Net: ~2 full-width HBM round trips per stage
instead of ~6.

Causality makes the tile scan sequential: the conv3 left context (last 2
raw-x columns) is carried across grid steps in VMEM scratch, so tiles
never overlap and no halo is re-fetched.

Per-row valid-length masking reproduces the engine's masked semantics
exactly: y is zeroed at positions >= valid (equivalent to
model.causal_conv1d's per-conv re-zeroing because conv1 is pointwise — no
cross-position leakage between the intermediate zeroings and this one),
and elu(0) == 0 keeps the invariant through the trailing ELU.

All dots run f32 with Precision.HIGHEST. The summation order differs from
the XLA conv lowering (~1e-5 activation deltas), so this backend's code
agreement is measured, not bit-guaranteed — see NOTES.md. Applicability:
num_residual_layers == 1 (dilation 1), constant pad, kernels (3, 1) — the
kyutai/mimi encoder geometry (transformers MimiEncoder,
modeling_mimi.py:444-486).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
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


def _resblock_kernel(
    x_ref,      # (1, C, TT)
    valid_ref,  # (B, 1) int32, whole array in SMEM (per-row blocks violate
                # the TPU (8,128) block rule; indexed by program_id instead)
    w3_ref,     # (3, C2, C)
    b3_ref,     # (C2, 1)
    w1_ref,     # (C, C2)
    b1_ref,     # (C, 1)
    ye_ref,     # (1, C, TT) output
    cx_ref,     # scratch (C, 2): last raw-x columns of the previous tile
    *,
    tile: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # causal left padding: conv3 is constant(0)-padded and elu(0) == 0,
        # so a zero carry is exact at the stream start
        cx_ref[:] = jnp.zeros_like(cx_ref)

    x = x_ref[0]  # (C, TT)
    xc = jnp.concatenate([cx_ref[:], x], axis=1)  # (C, TT+2)
    cx_ref[:] = x[:, tile - 2 :]

    xe = _elu(xc)
    # conv k=3 as 3 shifted matmuls: h[t'] = sum_k W3[k] @ xe[t'-2+k]
    h = _dot(w3_ref[0], xe[:, 0:tile])
    h = h + _dot(w3_ref[1], xe[:, 1 : tile + 1])
    h = h + _dot(w3_ref[2], xe[:, 2 : tile + 2])
    h = _elu(h + b3_ref[:])
    y = x + _dot(w1_ref[:], h) + b1_ref[:]

    # masked semantics: zero positions >= valid (x is already zero there;
    # the conv biases are not)
    v = valid_ref[pl.program_id(0), 0]
    pos = t * tile + jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    y = jnp.where(pos < v, y, 0.0)
    ye_ref[0] = _elu(y)


def _tile_for(c: int) -> int:
    """Tile width: ~32*C*tile bytes live in VMEM (double-buffered in/out
    blocks + ~4 intermediates), so C*tile <= 256k keeps us inside the 16 MB
    scoped limit with headroom."""
    t = (1 << 18) // c
    return max(512, min(8192, t // 128 * 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def resblock_elu_pallas(
    x: jax.Array,        # (B, C, T) float32
    valid: jax.Array,    # (B,) int32 valid positions of x
    w3: jax.Array,       # (C/2, C, 3)  HF OIH layout
    b3: jax.Array,       # (C/2,)
    w1: jax.Array,       # (C, C/2, 1)
    b1: jax.Array,       # (C,)
    interpret: bool = False,
) -> jax.Array:
    """elu(x + conv1(elu(conv3(elu(x))))) with masked semantics."""
    b, c, t = x.shape
    c2 = w3.shape[0]
    tile = _tile_for(c)
    n_t = -(-t // tile)
    t_pad = n_t * tile - t
    if t_pad:
        # zero right-pad: causal convs never let it affect earlier outputs
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad)))

    w3s = jnp.transpose(w3, (2, 0, 1)).astype(jnp.float32)  # (3, C2, C)
    w1m = w1[:, :, 0].astype(jnp.float32)                   # (C, C2)

    kernel = functools.partial(_resblock_kernel, tile=tile)
    ye = pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, c, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, c2, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, tile), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, n_t * tile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, 2), jnp.float32)],
        interpret=interpret,
    )(
        x,
        valid.astype(jnp.int32)[:, None],
        w3s,
        b3.astype(jnp.float32)[:, None],
        w1m,
        b1.astype(jnp.float32)[:, None],
    )
    return ye[:, :, :t]


def seanet_stage_pallas(
    x: jax.Array,
    valid: jax.Array,
    w3: jax.Array,
    b3: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    wd: jax.Array,
    bd: jax.Array,
    stride: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full stage: fused resblock+ELU (Pallas) then the strided causal
    downsample conv (XLA). Returns (z (B, CD, T//stride), new_valid)."""
    from tokenize_audio_tpu.mimi.model import causal_conv1d

    ye = resblock_elu_pallas(x, valid, w3, b3, w1, b1, interpret=interpret)
    return causal_conv1d(ye, valid, wd, bd, stride=stride)


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
