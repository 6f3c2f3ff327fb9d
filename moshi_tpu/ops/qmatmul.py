"""Pallas TPU kernel: fused int8-weight dequant matmul for decode.

The LM decode step is weight-bandwidth-bound: every 80 ms frame reads ~7 GB
of int8 weights for a [B<=2, din] activation.  XLA's convert+multiply+dot
fusion reaches ~580 GB/s on this shape; this kernel streams the int8 weight
tiles HBM->VMEM with the Pallas pipeline and dequantizes in registers,
reaching closer to HBM peak.

STATUS: correct but NOT faster than XLA for B<=2 gemv on this chip
(~410 GB/s vs XLA's ~580 GB/s): the MXU loads weight tiles at a fixed rate
regardless of how few activation rows there are, so skinny matmuls are MXU
weight-load bound, while XLA picks a VPU lowering.  Kept as an experiment;
useful once decode batches reach >= 8 rows.

y[B, dout] = (x[B, din] @ (q[din, dout].astype(bf16)) ) * scale[1, dout]

Note the per-output-channel scale commutes with the contraction, so the
dequant multiply happens once per output tile, not per weight element.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, scale_ref, o_ref, acc_ref):
    j = pl.program_id(1)  # din tile index (innermost)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], q_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_out", "block_in"))
def qgemv(x: jax.Array, q: jax.Array, scale: jax.Array, *,
          block_out: int = 512, block_in: int = 2048) -> jax.Array:
    """x: [B, din] bf16; q: [din, dout] int8; scale: [1, dout] -> [B, dout]."""
    B, din = x.shape
    dout = q.shape[1]
    block_in = min(block_in, din)
    block_out = min(block_out, dout)
    assert din % block_in == 0, (din, block_in)
    assert dout % block_out == 0, (dout, block_out)
    grid = (dout // block_out, din // block_in)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, block_in), lambda i, j: (0, j)),
            pl.BlockSpec((block_in, block_out), lambda i, j: (j, i)),
            pl.BlockSpec((1, block_out), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_out), jnp.float32)],
    )(x, q, scale)


def use_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
