"""Pallas TPU kernels: decode attention over an int4-packed KV cache (one
MXU pass per byte of cache).

Why a kernel: XLA cannot read a nibble-packed KV cache at speed — the
s4->bf16 convert does not fuse into the dot (measured v5e, B=8 ctx-3000 7B
shapes: 75 GB/s effective vs 403 GB/s for the int8 cache), and shift-based
unpacking materializes relayouts (50 GB/s).  Inside Pallas the packed block
is already in VMEM after one HBM read, and `pltpu.bitcast(int8, int4)`
reinterprets it with zero unpack arithmetic — the q4matmul recipe
(ops/q4matmul.py) applied to attention.

Two constraints shape the design, and they conflict in a single kernel:
1. Mosaic's fast mixed-type dot wants the int4 operand as the RHS with the
   contraction over its SUBLANE dim (an int4 LHS / lane contraction lowers
   through a slow convert; measured 23 ms vs 8 ms for the KV pass).
2. DMA wants every block row to be a long contiguous burst.  A flash-style
   single kernel must chunk BOTH K and V over positions, but K's fast-dot
   layout is channel-major [hd/2, cap], so position-chunks of K are 512-
   byte strided bursts — measured 158 GB/s effective.
So the pass is split in two, each chunking along its input's contiguous
minor dim, with the [B, H, cap] score matrix bounced through HBM
(~6 MB/layer at B=8, ~0.3 ms/frame — cheap against the 2x bandwidth win):

- `_scores_kernel`, grid (B, hd/HC): K [hd/2, cap] channel-pair packed
  (byte at (row r, lane s) = channels 2r/2r+1 of position s; bitcast ->
  K4 [HC, cap] in channel order).  Accumulates
    scores [H, cap] += dot(Qbd_c [H, HC] bf16, K4_c [HC, cap] int4)
  in VMEM scratch; K blocks are full-cap rows -> ~3 KB bursts.
- `_pv_kernel`, grid (B, cap/SC): online softmax over position chunks of
  the scores (+ k_scale, mask bias), then
    acc [H, hd] += dot(PW_c [H, SC] bf16, V4_c [SC, hd] int4)
  with V [cap/2, hd] POSITION-pair packed (nibble RMW writes; bitcast ->
  V4 [SC, hd] position order) -> 4 KB bursts.

Qbd is the block-diagonal rope'd q (row h = q head h in lanes h*D..(h+1)*D,
pre-scaled by 1/sqrt(D)), built in XLA per call; the dots waste a factor H
of MXU work on off-diagonal zeros, which is free because the pass is
HBM-bound (~200 GFLOP/frame at B=8 vs 197 TFLOP/s peak).  The PV kernel
accumulates the FULL [H, hd] product; the [h, h*D..] diagonal-block
extraction happens once in XLA afterwards (in-kernel it would relayout
512 KB across lanes every chunk).

Per-row scales commute with the contraction exactly as in the XLA int8
path (transformer.py _attention): k_scale multiplies scores, v_scale
multiplies the softmax weights.  Scales are stored transposed [H, cap] so
their chunks match the [H, SC] score tiles without relayout.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scores_kernel(qbd_ref, k_ref, o_ref, acc_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k4 = pltpu.bitcast(k_ref[0], jnp.int4)          # [HC, cap_pad]
    acc_ref[:] += jax.lax.dot_general(
        qbd_ref[0], k4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [H, cap_pad]

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:]


def _pv_kernel(s_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref,
               m_ref, l_ref, acc_ref, *, chunk, cap):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scores = s_ref[0]                               # [H, SC]
    scores = scores * ks_ref[0].astype(jnp.float32)
    scores = scores + bias_ref[0].astype(jnp.float32)
    # guard lanes past cap when the last chunk overhangs (padded reads)
    cols = c * chunk + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cols < cap, scores, -1e30)

    m_prev = m_ref[:]                               # [H, 1]
    l_prev = l_ref[:]
    m_c = jnp.max(scores, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_c)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                     # [H, SC]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pw = (p * vs_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    v4 = pltpu.bitcast(v_ref[0], jnp.int4)          # [SC, hd]
    pv = jax.lax.dot_general(
        pw, v4, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [H, hd]

    m_ref[:] = m_new
    l_ref[:] = l_new
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:] / l_ref[:]


@functools.partial(jax.jit, static_argnames=("chunk", "hd_chunk"))
def decode_attention_int4(q, k_packed, v_packed, k_scale, v_scale, mask,
                          chunk: int = 512, hd_chunk: int = 256):
    """q: [B, H, 1, D] (rope'd); k_packed: [B, hd/2, cap] int8 channel-pair
    packed; v_packed: [B, cap/2, hd] int8 position-pair packed;
    k_scale/v_scale: [B, H, cap]; mask: [B, cap] bool.
    Returns [B, 1, H*D] f32."""
    B, H, T, D = q.shape
    assert T == 1
    cap = 2 * v_packed.shape[1]
    hd = H * D
    chunk = min(chunk, max(2 * ((cap + 1) // 2), 8))
    hd_chunk = min(hd_chunk, hd)
    if hd % hd_chunk:
        hd_chunk = hd
    nc = -(-cap // chunk)
    cap_pad = nc * chunk

    # block-diagonal Q, pre-scaled: row h = q[b, h] / sqrt(D) in lanes
    # [h*D, (h+1)*D)
    qf = q[:, :, 0, :].astype(jnp.float32) / math.sqrt(D)  # [B, H, D]
    lane_h = jnp.arange(hd) // D                           # [H*D]
    qflat = qf.reshape(B, hd)                              # [B, H*D]
    qbd = jnp.where(jnp.arange(H)[None, :, None] == lane_h[None, None, :],
                    qflat[:, None, :], 0.0).astype(jnp.bfloat16)  # [B,H,hd]

    scores = pl.pallas_call(
        _scores_kernel,
        grid=(B, hd // hd_chunk),
        in_specs=[
            pl.BlockSpec((1, H, hd_chunk), lambda b, c: (b, 0, c)),
            pl.BlockSpec((1, hd_chunk // 2, cap_pad), lambda b, c: (b, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, cap_pad), lambda b, c: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, cap_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, cap_pad), jnp.float32)],
    )(qbd, k_packed)

    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_pv_kernel, chunk=chunk, cap=cap),
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, chunk), lambda b, c: (b, 0, c)),
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
    )(scores, v_packed, k_scale, v_scale, bias)
    # diagonal-block extraction: out[b, h, :] = full[b, h, h*D:(h+1)*D]
    out = out.reshape(B, H, H, D)
    out = jnp.einsum("bhhd->bhd", out)
    return out.reshape(B, 1, hd)
