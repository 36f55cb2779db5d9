"""Fused residual-vector-quantization Pallas kernel.

The RVQ encode chain (transformers MimiResidualVectorQuantizer.encode,
modeling_mimi.py:1269-1287) is, per codebook level: a (N, D) x (D, V)
distance matmul, an argmin over V, a codeword gather, and a residual
subtraction — with a sequential dependency across levels. This kernel fuses
the whole chain on-chip:

  - grid = (row blocks, n_books); on TPU the minor grid axis runs
    sequentially per core, so the residual lives in a VMEM scratch carried
    across book steps while pallas double-buffers the NEXT book's
    (V, D) embedding table from HBM during the current book's compute;
  - the gather is expressed as one_hot(idx) @ E — a second MXU matmul —
    instead of a vector gather, keeping everything on the systolic array;
  - per-book code indices accumulate in a lane-padded VMEM scratch and
    flush to the (N, K) output once per row block on the last book
    (satisfies the (8, 128) tile rule for the tiny K output dim);
  - distances use the same ||x||^2 - 2 x.e + ||e||^2 expansion as the
    XLA path, so argmin indices match the jnp implementation bit-for-bit
    away from exact float ties (tests pin equality on real data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256
_CODE_LANES = 128  # scratch lane padding for the per-book code columns


def _rvq_kernel(x_ref, e_ref, e2_ref, out_ref, res_ref, codes_ref):
    k = pl.program_id(1)
    n_books = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        res_ref[:] = x_ref[:]

    r = res_ref[:]  # (B, D)
    e = e_ref[0]  # (V, D)
    scores = jax.lax.dot_general(
        r,
        e,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # match the XLA path's f32 MXU passes
    )  # (B, V)
    x2 = jnp.sum(r * r, axis=-1, keepdims=True)
    d2 = x2 - 2.0 * scores + e2_ref[0]
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # (B,)
    col = jax.lax.broadcasted_iota(jnp.int32, codes_ref.shape, 1)
    codes_ref[:] = jnp.where(col == k, idx[:, None], codes_ref[:])
    onehot = jax.nn.one_hot(idx, e.shape[0], dtype=jnp.float32)  # (B, V)
    res_ref[:] = r - jnp.dot(
        onehot, e, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )

    @pl.when(k == n_books - 1)
    def _():
        out_ref[:] = codes_ref[:, : out_ref.shape[1]]


@functools.partial(jax.jit, static_argnames=("interpret",))
def rvq_quantize_pallas(
    x: jax.Array,  # (N, D) float32 projected embeddings
    embeds: jax.Array,  # (K, V, D) float32
    interpret: bool = False,
) -> jax.Array:
    """Chained nearest-centroid codes (N, K) int32."""
    n, d = x.shape
    k, v, _ = embeds.shape
    n_pad = -(-n // BLOCK_ROWS) * BLOCK_ROWS
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    e2 = jnp.sum(jnp.square(embeds), axis=-1)[:, None, :]  # (K, 1, V)
    grid = (n_pad // BLOCK_ROWS, k)
    out = pl.pallas_call(
        _rvq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, d), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, v), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_ROWS, d), jnp.float32),
            pltpu.VMEM((BLOCK_ROWS, _CODE_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(x, embeds, e2)
    return out[:n]


def rvq_encode_pallas(
    x_proj: jax.Array,  # (B, T, D)
    embeds: jax.Array,  # (K, V, D)
    interpret: bool = False,
) -> jax.Array:
    """(B, T, D) -> codes (B, K, T), kernel-fused."""
    b, t, d = x_proj.shape
    codes = rvq_quantize_pallas(x_proj.reshape(b * t, d), embeds, interpret=interpret)
    return codes.reshape(b, t, -1).transpose(0, 2, 1)
