"""Pallas TPU kernel: fused decode attention over an int8 ring KV cache.

Flash-decoding for T=1 queries: per (batch, head) program, stream the int8
K/V tiles HBM->VMEM, dequantize per-row scales into the attention
scores/weights, and accumulate with an online softmax.  This keeps KV HBM
traffic at 1 byte/element (vs 2 for bf16, and vs XLA's int8 path which
materializes a dequantized bf16 copy).

Layout: head-major caches [B, H, S, D] (S-contiguous per head), scales
[B, H, S, 1], boolean mask [B, S, 1] shared across heads, q [B, H, D].

STATUS: correct (0.2% rel err) but NOT faster than XLA on this chip for
B=1 decode: measured ~105 GB/s vs XLA's ~950 GB/s bf16 attention.  The
[1, D] x [D, S] products are MXU weight-load-latency bound (the same wall as
ops/qmatmul.py); XLA lowers skinny B=1 contractions to VPU code that streams
at memory speed.

REVISITED at B=8 (round 2, the stated crossover): still loses.  The XLA
int8-KV attention runs ~443 GB/s effective inside the frame; Pallas
online-softmax variants over [B*H, S, D] int8 KV cap at ~300 GB/s on the
pure DMA pattern alone (multi-head blocks, 2-D scales — note [.., 1] scale
blocks lane-pad 1->128, a 128x traffic blowup to avoid), and the VPU
mul+lane-reduce score path runs at ~119 GB/s.  Decode attention stays XLA;
kept as a documented experiment.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, mask_ref, o_ref,
            m_ref, l_ref, acc_ref, *, scale):
    h = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[0, 0] = -jnp.inf
        l_ref[0, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    H = q_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == h
    q = jnp.sum(jnp.where(row, q_ref[0], 0).astype(jnp.float32), axis=0,
                keepdims=True)      # [1, D] — one-hot row select (dynamic
    # sublane slicing requires 8-alignment on TPU)
    k = k_ref[0, 0]                 # [Ts, D] int8
    scores = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [1, Ts]
    ks = ks_ref[0, 0][:, 0].astype(jnp.float32)      # [Ts]
    scores = scores * (ks[None, :] * scale)
    valid = mask_ref[0][:, 0][None, :]               # [1, Ts]
    scores = jnp.where(valid, scores, -jnp.inf)

    m_prev = m_ref[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(scores))
    m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    p = jnp.exp(scores - m_safe)                     # [1, Ts]
    p = jnp.where(valid, p, 0.0)
    corr = jnp.exp(m_prev - m_safe)
    corr = jnp.where(jnp.isnan(corr) | jnp.isinf(corr), 0.0, corr)

    l_ref[0, 0] = l_ref[0, 0] * corr + jnp.sum(p)
    vs = vs_ref[0, 0][:, 0].astype(jnp.float32)      # [Ts]
    pv = p * vs[None, :]
    v = v_ref[0, 0]                                  # [Ts, D] int8
    pv_dot = jax.lax.dot_general(
        pv.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [1, D]
    acc_ref[:] = acc_ref[:] * corr + pv_dot
    m_ref[0, 0] = m_new

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[0, 0], 1e-20)
        val = (acc_ref[:] / denom).astype(o_ref.dtype)  # [1, D]
        o_ref[0] = jnp.where(row, jnp.broadcast_to(val, o_ref.shape[1:]),
                             o_ref[0])


@functools.partial(jax.jit, static_argnames=("block_s",))
def decode_attention_int8(q: jax.Array, k: jax.Array, k_scale: jax.Array,
                          v: jax.Array, v_scale: jax.Array, mask: jax.Array,
                          *, block_s: int = 512) -> jax.Array:
    """q: [B, H, D] bf16; k/v: [B, H, S, D] int8; k_scale/v_scale:
    [B, H, S, 1]; mask: [B, S, 1] bool -> out [B, H, D]."""
    B, H, D = q.shape
    S = k.shape[2]
    assert S % block_s == 0, (S, block_s)
    scale = 1.0 / math.sqrt(D)
    grid = (B, H, S // block_s)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, h, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_s, D), lambda b, h, s: (b, h, s, 0)),
            pl.BlockSpec((1, 1, block_s, 1), lambda b, h, s: (b, h, s, 0)),
            pl.BlockSpec((1, 1, block_s, D), lambda b, h, s: (b, h, s, 0)),
            pl.BlockSpec((1, 1, block_s, 1), lambda b, h, s: (b, h, s, 0)),
            pl.BlockSpec((1, block_s, 1), lambda b, h, s: (b, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, h, s: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )(q, k, k_scale, v, v_scale, mask)
