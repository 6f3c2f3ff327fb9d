"""Pallas TPU kernel: decode attention over an int4-packed KV cache (one
MXU pass per byte of cache, flash-decode online softmax).

Why a kernel: XLA cannot read a nibble-packed KV cache at speed — the
s4->bf16 convert does not fuse into the dot (measured v5e, B=8 ctx-3000 7B
shapes: 75 GB/s effective vs 403 GB/s for the int8 cache), and shift-based
unpacking materializes relayouts (50 GB/s).  Inside Pallas the packed block
is already in VMEM after one HBM read, and `pltpu.bitcast(int8, int4)`
reinterprets it with zero unpack arithmetic — the q4matmul recipe
(ops/q4matmul.py) applied to attention.

Layouts are chosen so BOTH dots are Mosaic's fast mixed-type form — int4 as
the RHS with the contraction over its SUBLANE dim, exactly like q4gemm
(an int4 LHS / lane contraction lowers through a slow convert+transpose):

- K cache [hd/2, cap] int8, CHANNEL-pair packed and position-major along
  lanes: the byte at (row r, lane s) holds channel 2r of position s in the
  low nibble and channel 2r+1 in the high.  `pltpu.bitcast` doubles the
  sublane dim interleaved -> K4 [hd, Sc] in channel order, and
    scores [H, Sc] = dot(Qbd [H, hd] bf16, K4 [hd, Sc] int4).
  Writes are plain column scatters (a position's channels live in one
  column; no read-modify-write).
- V cache [cap/2, hd] int8, POSITION-pair packed: byte at (row r, lane c)
  holds positions 2r/2r+1 of channel c.  bitcast -> V4 [Sc, hd], and
    acc [H, hd] += dot(PW [H, Sc] bf16, V4 [Sc, hd] int4).
  Writes are nibble read-modify-writes (transformer._rmw_nibble).

Qbd is the block-diagonal rope'd q (row h = q head h in lanes h*D..(h+1)*D,
pre-scaled by 1/sqrt(D)), built in XLA per call; both dots waste a factor H
of MXU work on off-diagonal zeros, which is free because the pass is
HBM-bound (~200 GFLOP/frame at B=8 vs 197 TFLOP/s peak).  The kernel
accumulates the FULL [H, hd] PV product; the [h, h*D..] diagonal-block
extraction happens once in XLA afterwards (in-kernel it would relayout
512 KB across lanes every chunk).

Per-row scales commute with the contraction exactly as in the XLA int8
path (transformer.py _attention): k_scale multiplies scores, v_scale
multiplies the softmax weights.  Scales are stored transposed [H, cap] so
their chunks match the [H, Sc] score tiles without relayout.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qbd_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref,
            m_ref, l_ref, acc_ref, *, chunk, cap):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k4 = pltpu.bitcast(k_ref[0], jnp.int4)          # [hd, Sc]
    scores = jax.lax.dot_general(
        qbd_ref[0], k4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [H, Sc]
    scores = scores * ks_ref[0].astype(jnp.float32)
    scores = scores + bias_ref[0].astype(jnp.float32)
    # guard lanes past cap when the last chunk overhangs (padded reads)
    cols = c * chunk + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cols < cap, scores, -1e30)

    m_prev = m_ref[:]                               # [H, 1]
    l_prev = l_ref[:]
    m_c = jnp.max(scores, axis=1, keepdims=True)    # [H, 1]
    m_new = jnp.maximum(m_prev, m_c)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                     # [H, Sc]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pw = (p * vs_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    v4 = pltpu.bitcast(v_ref[0], jnp.int4)          # [Sc, hd]
    pv = jax.lax.dot_general(
        pw, v4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [H, hd]

    m_ref[:] = m_new
    l_ref[:] = l_new
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:] / l_ref[:]


@functools.partial(jax.jit, static_argnames=("chunk",))
def decode_attention_int4(q, k_packed, v_packed, k_scale, v_scale, mask,
                          chunk: int = 512):
    """q: [B, H, 1, D] (rope'd); k_packed: [B, hd/2, cap] int8 channel-pair
    packed; v_packed: [B, cap/2, hd] int8 position-pair packed;
    k_scale/v_scale: [B, H, cap]; mask: [B, cap] bool.
    Returns [B, 1, H*D] f32."""
    B, H, T, D = q.shape
    assert T == 1
    cap = 2 * v_packed.shape[1]
    hd = H * D
    chunk = min(chunk, max(2 * ((cap + 1) // 2), 8))

    # block-diagonal Q, pre-scaled: row h = q[b, h] / sqrt(D) in lanes
    # [h*D, (h+1)*D)
    qf = q[:, :, 0, :].astype(jnp.float32) / math.sqrt(D)  # [B, H, D]
    lane_h = jnp.arange(hd) // D                           # [H*D]
    qflat = qf.reshape(B, hd)                              # [B, H*D]
    qbd = jnp.where(jnp.arange(H)[None, :, None] == lane_h[None, None, :],
                    qflat[:, None, :], 0.0).astype(jnp.bfloat16)  # [B,H,hd]

    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]

    nc = -(-cap // chunk)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, cap=cap),
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, hd // 2, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, chunk // 2, hd), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, H, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, H, chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, 1, chunk), lambda b, c: (b, 0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, hd), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, hd), jnp.float32),
        ],
    )(qbd, k_packed, v_packed, k_scale, v_scale, bias)
    # diagonal-block extraction: out[b, h, :] = full[b, h, h*D:(h+1)*D]
    out = out.reshape(B, H, H, D)
    out = jnp.einsum("bhhd->bhd", out)
    return out.reshape(B, 1, hd)
