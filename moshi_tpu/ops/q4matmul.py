"""Pallas TPU kernel: fused 4-bit-weight unpack + dequant + matmul.

QTensor4 stores MLX-q4/gguf-style group-wise 4-bit weights nibble-packed in
int8 (`utils/quantize.py`) with SEQUENTIAL-PAIR packing: the byte at packed
row i holds logical din position 2i in the low nibble and 2i+1 in the high
nibble.  This matches Mosaic's native int4 layout: `pltpu.bitcast(int8_block,
jnp.int4)` doubles the sublane dim interleaved (out row 2r = low nibble of
row r, 2r+1 = high nibble, signed), so the packed block reinterprets as the
weight block with ZERO unpack arithmetic.

The remaining VPU work is one int4->bf16 convert per element plus the group
scales.  A naive per-element scale multiply dominates (measured v5e, 7B
shapes at B=8, sustained chained passes, bytes-of-packed-weights bandwidth):

  two-plane packing + mask/xor/sub unpack (old kernel)   14.7 ms  280 GB/s
  + shift-based sign extension                           13.0 ms  316 GB/s
  int4 bitcast + per-element scale mul                   12.5 ms  328 GB/s
  int4 bitcast + bf16 convert + group post-dot scaling    9.6 ms  430 GB/s
  int4 straight into per-group dots + post-dot scaling    8.9 ms  460 GB/s  <- this file
  int4 bitcast + one dot, scales skipped (floor)          8.3 ms  498 GB/s
  int8 bytes straight into the dot (hw ceiling probe)     7.5 ms  551 GB/s

Per-group post-dot scaling: y += (x_g @ w4_g) * s[g, :] feeds the int4
slices directly to the MXU (Mosaic mixed-type dot — no convert on the VPU)
and runs the scale multiply on [B, block_out] per group instead of on every
weight element — B/group_size (= 1/4 at B=8) VPU ops per element instead
of 1.  XLA's lowering of the full unpack (`QTensor4.astype`) materializes
the bf16 weights in HBM every step (~170 ms/frame on the 7B — unusable).
Context: XLA's int8 dequant path reaches ~907 GB/s effective at B>=8 (MXU
native int8), so group-wise q4 does not beat int8 on step time at batch —
its wins are memory (4 GB vs 7.2 GB -> bigger batch/context) and B=1
latency parity (21.4 vs 21.0 ms/frame whole-model).

Reference capability parity: MLX q4 gs=32 serving (moshi_mlx local.py:101-103).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# The dout grid dim is embarrassingly parallel; only the din dim carries the
# accumulator.  Declaring this lets Mosaic pipeline output-block DMAs instead
# of treating the whole grid as sequential.  The VMEM cap is raised past the
# default ~16 MB scoped limit (v5e has 128 MiB) so bigger double-buffered
# weight blocks are legal; actual block sizes stay env-tunable.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=100 * 2**20,
)


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs):
    j = pl.program_id(1)  # din tile index (innermost)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    half, bo = q_ref.shape
    # reinterpret the packed bytes as int4: [half, bo] int8 -> [2*half, bo]
    # int4 with rows interleaved exactly in logical din order (sequential-pair
    # packing); the slices feed the MXU directly, no VPU convert.
    w = pltpu.bitcast(q_ref[:], jnp.int4)
    # per-group dots with post-dot scaling: the [B, bo] rescale costs
    # B/gs VPU ops per weight element vs 1 for scaling w itself.
    for g in range(2 * half // gs):
        p = jax.lax.dot_general(
            x_ref[:, g * gs:(g + 1) * gs], w[g * gs:(g + 1) * gs, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] += p * s_ref[g, 0, :][None, :]

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_out", "block_in", "interpret"))
def q4gemm(x: jax.Array, q: jax.Array, scale: jax.Array, *,
           block_out: int = 1024, block_in: int = 1024,
           interpret: bool = False) -> jax.Array:
    """x: [B, din]; q: [din/2, dout] int8 sequential-pair nibbles; scale:
    [din/gs, 1, dout] -> [B, dout] in x.dtype.

    block_in counts logical din positions (one grid step reads block_in/2
    packed rows).
    """
    B, din = x.shape
    P2, dout = q.shape
    assert 2 * P2 == din, (P2, din)
    G = scale.shape[0]
    gs = din // G
    block_in = min(block_in, din)
    block_out = min(block_out, dout)
    assert din % block_in == 0 and block_in % gs == 0, (din, block_in, gs)
    assert block_in % 2 == 0, block_in
    assert dout % block_out == 0, (dout, block_out)
    gin = block_in // gs
    grid = (dout // block_out, din // block_in)
    return pl.pallas_call(
        functools.partial(_kernel, gs=gs),
        grid=grid,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((B, block_in), lambda i, j: (0, j)),            # x
            pl.BlockSpec((block_in // 2, block_out), lambda i, j: (j, i)),  # q
            pl.BlockSpec((gin, 1, block_out), lambda i, j: (j, 0, i)),   # s
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, block_out), jnp.float32)],
        interpret=interpret,
    )(x, q, scale)


def _kernel_stacked(n_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs):
    del n_ref  # consumed by the index maps
    j = pl.program_id(1)  # din tile index (innermost)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, half, bo = q_ref.shape
    w = pltpu.bitcast(q_ref[0], jnp.int4)
    for g in range(2 * half // gs):
        p = jax.lax.dot_general(
            x_ref[:, g * gs:(g + 1) * gs], w[g * gs:(g + 1) * gs, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] += p * s_ref[0, g, 0, :][None, :]

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_out", "block_in", "interpret"))
def q4gemm_stacked(x: jax.Array, q: jax.Array, scale: jax.Array,
                   idx: jax.Array, *, block_out: int = 1024,
                   block_in: int = 1024, interpret: bool = False) -> jax.Array:
    """q4gemm over ONE member of a stacked weight: q [N, din/2, dout],
    scale [N, din/gs, 1, dout], idx scalar int32 selecting the member.

    The index rides scalar prefetch (index_map args: grid..., scalar_ref) so
    the kernel DMAs blocks of the selected member straight out of the full
    stack.  Slicing the member out first costs a full HBM copy per call —
    a pallas operand cannot fuse a dynamic-slice (same lesson as the int4
    KV cache, ops/int4_attention.py) — measured ~5 ms/frame on the 7B's
    32-layer scan at B=1."""
    B, din = x.shape
    N, P2, dout = q.shape
    assert 2 * P2 == din, (P2, din)
    G = scale.shape[1]
    gs = din // G
    block_in = min(block_in, din)
    block_out = min(block_out, dout)
    assert din % block_in == 0 and block_in % gs == 0, (din, block_in, gs)
    assert dout % block_out == 0, (dout, block_out)
    gin = block_in // gs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(dout // block_out, din // block_in),
        in_specs=[
            pl.BlockSpec((B, block_in), lambda i, j, n: (0, j)),
            pl.BlockSpec((1, block_in // 2, block_out),
                         lambda i, j, n: (n[0], j, i)),
            pl.BlockSpec((1, gin, 1, block_out),
                         lambda i, j, n: (n[0], j, 0, i)),
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda i, j, n: (0, i)),
        scratch_shapes=[pltpu.VMEM((B, block_out), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_stacked, gs=gs),
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=jax.ShapeDtypeStruct((B, dout), x.dtype),
        interpret=interpret,
    )(idx.reshape(1).astype(jnp.int32), x, q, scale)


def use_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# Block-size limits used by wdot's dispatch (overridable via env for perf
# experiments).  Defaults measured on-chip (v5e, 7B gemv chain at B=1,
# scripts/bench_b1_breakdown.py gemv): (1024, 1024) 537 GB/s;
# (2048, 2048) 654; (1024, 4096) 660 <- default; (4096, 4096) exceeds the
# 16 MB scoped-VMEM limit.
def block_limits() -> tuple[int, int]:
    import os
    return (int(os.environ.get("MOSHI_Q4_BLOCK_IN", 1024)),
            int(os.environ.get("MOSHI_Q4_BLOCK_OUT", 4096)))
