"""Pallas TPU kernel: fused 4-bit-weight unpack + dequant + matmul.

QTensor4 stores MLX-q4/gguf-style group-wise 4-bit weights nibble-packed in
int8 (`utils/quantize.py`) with TWO-PLANE packing: the byte at logical din
position i (i < din/2) holds position i in the low nibble and position
i + din/2 in the high nibble.

XLA's lowering of the unpack (`QTensor4.astype`) materializes the bf16
weights in HBM every step (~170 ms/frame on the 7B — unusable).  This kernel
streams the *packed* tiles HBM->VMEM (0.5 bytes/element — half the int8
path's traffic, a quarter of bf16), sign-extends each plane with pure
elementwise ops (no interleave/stack relayouts — that is what the two-plane
packing buys), applies the group scales in registers, and runs one MXU dot
per plane:

y[B, dout] = x[:, :din/2] @ deq(low) + x[:, din/2:] @ deq(high)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_lo_ref, x_hi_ref, q_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref, *,
            gs):
    j = pl.program_id(1)  # din tile index (innermost)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x32 = q_ref[:].astype(jnp.int32)        # [gin, gs, bo]
    low = jnp.bitwise_xor(jnp.bitwise_and(x32, 0xF), 8) - 8
    high = jnp.bitwise_xor(jnp.bitwise_and(jnp.right_shift(x32, 4), 0xF), 8) - 8
    gin, _, bo = q_ref.shape
    w_lo = (low.astype(jnp.bfloat16)
            * s_lo_ref[:].astype(jnp.bfloat16)).reshape(gin * gs, bo)
    w_hi = (high.astype(jnp.bfloat16)
            * s_hi_ref[:].astype(jnp.bfloat16)).reshape(gin * gs, bo)
    acc_ref[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_out", "block_in", "interpret"))
def q4gemm(x: jax.Array, q: jax.Array, scale: jax.Array, *,
           block_out: int = 1024, block_in: int = 1024,
           interpret: bool = False) -> jax.Array:
    """x: [B, din]; q: [din/(2*gs), gs, dout] int8 two-plane nibbles; scale:
    [din/gs, 1, dout] -> [B, dout] in x.dtype.

    block_in counts *per-plane* din positions (so one grid step covers
    2*block_in logical din positions).
    """
    B, din = x.shape
    P, gs, dout = q.shape
    assert 2 * P * gs == din, (P, gs, din)
    half = din // 2
    block_in = min(block_in, half)
    block_out = min(block_out, dout)
    assert half % block_in == 0 and block_in % gs == 0, (half, block_in, gs)
    assert dout % block_out == 0, (dout, block_out)
    gin = block_in // gs
    G = scale.shape[0]
    grid = (dout // block_out, half // block_in)
    return pl.pallas_call(
        functools.partial(_kernel, gs=gs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, block_in), lambda i, j: (0, j)),            # x low
            pl.BlockSpec((B, block_in), lambda i, j, _h=half // block_in:
                         (0, j + _h)),                                   # x high
            pl.BlockSpec((gin, gs, block_out), lambda i, j: (j, 0, i)),  # q
            pl.BlockSpec((gin, 1, block_out), lambda i, j: (j, 0, i)),   # s low
            pl.BlockSpec((gin, 1, block_out), lambda i, j, _g=G // 2 // gin:
                         (j + _g, 0, i)),                                # s high
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_out), jnp.float32)],
        interpret=interpret,
    )(x, x, q, scale, scale)


def use_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
