"""Pallas TPU kernel: flash decode attention over an int4-packed KV cache
(one MXU pass per byte of cache, online softmax, no intermediates).

Why a kernel: XLA cannot read a nibble-packed KV cache at speed — the
s4->bf16 convert does not fuse into the dot (measured v5e, B=8 ctx-3000 7B
shapes: 75 GB/s effective vs 403 GB/s for the int8 cache), and shift-based
unpacking materializes relayouts (50 GB/s).  Inside Pallas the packed block
is already in VMEM after one HBM read, and `pltpu.bitcast(int8, int4)`
reinterprets it with zero unpack arithmetic — the q4matmul recipe
(ops/q4matmul.py) applied to attention.

The dot form matters more than anything else here (all measured on-chip,
B=8 ctx-3000 7B shapes, whole-cache passes):
- block-diagonal Q against [hd, Sc] blocks wastes a factor H of MXU work,
  and M=32 dots only run at 5-10 TFLOP/s on v5e -> 150 GB/s effective;
- Mosaic's BATCHED dot_general (batch dim 0 in BOTH operands — other
  positions are unimplemented) runs the per-head matvecs at ~270 GB/s.

Both K and V therefore live CHANNEL-pair packed, position-major along
lanes: [hd/2, cap] int8 where the byte at (row r, lane s) holds channels
2r (low nibble) / 2r+1 (high) of position s.  `pltpu.bitcast` doubles the
sublane dim interleaved -> [hd, Sc] in channel order, and a free leading
reshape gives [H, D, Sc].  Per grid step (b, chunk):

  scores [H, Sc] = dot(q3 [H, 1, D], K4r [H, D, Sc])   # batch 0, rhs
                                                       # sublane contraction
  ... * k_scale + mask bias -> online softmax (m, l [H, 1] scratch)
  acc [H, D]    += dot(pw3 [H, 1, Sc], V4r [H, D, Sc]) # batch 0, BOTH
                                                       # lane contraction
                                                       # (transpose_rhs)

Cache writes are plain column scatters (a position's channels live in one
[hd/2] column — no read-modify-write).  Qbd/rope'd q is pre-scaled by
1/sqrt(D) in XLA.  Per-row scales commute with the contraction exactly as
in the XLA int8 path (transformer.py _attention): k_scale multiplies
scores, v_scale multiplies the softmax weights; both are stored transposed
[H, cap] so their chunks match the [H, Sc] score tiles without relayout.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref,
            m_ref, l_ref, acc_ref, *, heads, head_dim, chunk, cap):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    H, D = heads, head_dim
    k4 = pltpu.bitcast(k_ref[0], jnp.int4).reshape(H, D, chunk)
    q3 = q_ref[0].reshape(H, 1, D)
    scores = lax.dot_general(
        q3, k4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]    # [H, Sc]
    scores = scores * ks_ref[0].astype(jnp.float32)
    scores = scores + bias_ref[0].astype(jnp.float32)
    # guard lanes past cap when the last chunk overhangs (padded reads)
    cols = c * chunk + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cols < cap, scores, -1e30)

    m_prev = m_ref[:]                                   # [H, 1]
    l_prev = l_ref[:]
    m_c = jnp.max(scores, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_c)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                         # [H, Sc]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pw = (p * vs_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    v4 = pltpu.bitcast(v_ref[0], jnp.int4).reshape(H, D, chunk)
    pv = lax.dot_general(
        pw.reshape(H, 1, chunk), v4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]    # [H, D]

    m_ref[:] = m_new
    l_ref[:] = l_new
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:] / l_ref[:]


@functools.partial(jax.jit, static_argnames=("chunk",))
def decode_attention_int4(q, k_packed, v_packed, k_scale, v_scale, mask,
                          chunk: int = 1024):
    """q: [B, H, 1, D] (rope'd); k_packed/v_packed: [B, hd/2, cap_pad] int8
    channel-pair packed position-major (lane dim padded to a 128 multiple);
    k_scale/v_scale: [B, H, cap]; mask: [B, cap] bool (logical cap).
    Returns [B, 1, H*D] f32."""
    B, H, T, D = q.shape
    assert T == 1
    cap_pad = k_packed.shape[-1]
    cap = k_scale.shape[-1]
    assert cap_pad % 128 == 0 and cap_pad >= cap
    hd = H * D
    # largest divisor of cap_pad that's a multiple of 128 and <= chunk, so
    # every block is lane-aligned and in-bounds
    chunk = max(d for d in range(128, min(chunk, cap_pad) + 1, 128)
                if cap_pad % d == 0)
    nc = cap_pad // chunk

    qf = (q[:, :, 0, :].astype(jnp.float32) / math.sqrt(D)).astype(jnp.bfloat16)
    pad = cap_pad - cap
    if pad:
        k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, pad)))
        v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, heads=H, head_dim=D, chunk=chunk, cap=cap),
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, hd // 2, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, hd // 2, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, H, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, H, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, 1, chunk), lambda b, c: (b, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
    )(qf, k_packed, v_packed, k_scale, v_scale, bias)
    return out.reshape(B, 1, hd)
