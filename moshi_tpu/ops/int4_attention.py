"""Pallas TPU kernel: flash decode attention over an int4-packed KV cache
(one MXU pass per byte of cache, online softmax, no intermediates).

Why a kernel: XLA cannot read a nibble-packed KV cache at speed — the
s4->bf16 convert does not fuse into the dot (measured v5e, B=8 ctx-3000 7B
shapes: 75 GB/s effective vs 403 GB/s for the int8 cache), and shift-based
unpacking materializes relayouts (50 GB/s).  Inside Pallas the packed block
is already in VMEM after one HBM read, and `pltpu.bitcast(int8, int4)`
reinterprets it with zero unpack arithmetic — the q4matmul recipe
(ops/q4matmul.py) applied to attention.

Hard-won structure (all measured on-chip, B=8 ctx-3000 7B shapes):
- Mosaic's BATCHED dot_general (batch dim 0 in BOTH operands — other
  positions are unimplemented) runs the per-head matvecs at ~270 GB/s;
  a block-diagonal-Q formulation managed 150 (M=32 dots cap at 5-10
  TFLOP/s on v5e, so H-fold redundant MXU work is not free).
- K and V live CHANNEL-pair packed, position-major: [L, B, hd/2, cap_pad]
  int8 where the byte at (row r, lane s) holds channels 2r (low nibble) /
  2r+1 (high) of position s.  `pltpu.bitcast` doubles the sublane dim
  interleaved -> [hd, Sc] in channel order; a free leading reshape gives
  the [H, D, Sc] batched-dot operand.
- The kernel indexes the LAYER via a scalar-prefetch argument, reading
  blocks of the full [L, ...] cache stack directly: slicing one layer out
  in XLA before a pallas_call materializes a 49 MB copy per layer
  (+6 GB/frame of traffic on the 7B).
- The kernel returns UNNORMALIZED flash state (acc, m, l): the caller
  injects the current frame's (unquantized) K/V row analytically and
  normalizes.  This lets cache WRITES be deferred to one per-slot
  dynamic-update-slice after the layer scan — in-scan lane scatters made
  XLA pick a scatter-friendly transposed cache layout and copy the whole
  cache every frame (59 ms frames), and per-(layer, slot) DUS chains were
  op-latency bound (4 ms).

Per grid step (b, chunk):
  scores [H, Sc] = dot(q3 [H, 1, D], K4r [H, D, Sc])   # batch 0, rhs
                                                       # sublane contraction
  ... * k_scale + mask bias -> online softmax (m, l [H, 1] scratch)
  acc [H, D]    += dot(pw3 [H, 1, Sc], V4r [H, D, Sc]) # batch 0, BOTH
                                                       # lane contraction

Per-row scales commute with the contraction exactly as in the XLA int8
path (transformer.py _attention): k_scale multiplies scores, v_scale
multiplies the softmax weights; both are stored transposed [H, cap] so
their chunks match the [H, Sc] score tiles without relayout.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref,
            acc_o_ref, m_o_ref, l_o_ref,
            m_ref, l_ref_s, acc_ref, *, heads, head_dim, chunk, cap):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref_s[:] = jnp.zeros_like(l_ref_s)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    H, D = heads, head_dim
    k4 = pltpu.bitcast(k_ref[0, 0], jnp.int4).reshape(H, D, chunk)
    q3 = q_ref[0].reshape(H, 1, D)
    scores = lax.dot_general(
        q3, k4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]    # [H, Sc]
    scores = scores * ks_ref[0, 0].astype(jnp.float32)
    scores = scores + bias_ref[0, 0].astype(jnp.float32)
    # guard lanes past cap when the last chunk overhangs (padded reads)
    cols = c * chunk + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(cols < cap, scores, -1e30)

    m_prev = m_ref[:]                                   # [H, 1]
    l_prev = l_ref_s[:]
    m_c = jnp.max(scores, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_c)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                         # [H, Sc]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pw = (p * vs_ref[0, 0].astype(jnp.float32)).astype(jnp.bfloat16)
    v4 = pltpu.bitcast(v_ref[0, 0], jnp.int4).reshape(H, D, chunk)
    pv = lax.dot_general(
        pw.reshape(H, 1, chunk), v4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]    # [H, D]

    m_ref[:] = m_new
    l_ref_s[:] = l_new
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        acc_o_ref[0] = acc_ref[:]
        m_o_ref[0] = m_ref[:]
        l_o_ref[0] = l_ref_s[:]


def _kernel_folded(l_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref,
                   acc_o_ref, m_o_ref, l_o_ref,
                   m_ref, l_ref_s, acc_ref, *, groups, fold, chunk, cap):
    """head_dim < 128 variant: `fold` = 128 // head_dim heads share one
    128-lane dot row-block (tts_v0_1 is 32 heads x 64 — the plain kernel's
    [H, 1, 64] operands are lane-dim-64 shapes Mosaic cannot lay out).

    q arrives pre-placed [B, groups, fold, 128]: row (g, i) holds head
    (g*fold + i)'s channels at lanes i*D..(i+1)*D-1 and ZEROS elsewhere, so
    the batched dot against the [groups, 128, chunk] channel-major cache
    view computes each head's true scores (the zero lanes mask the other
    heads' rows) — every Mosaic construct stays at the proven 128-lane
    shapes.  The PV dot yields [groups, fold, 128]; the caller selects the
    per-head diagonal D-blocks outside the kernel.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref_s[:] = jnp.zeros_like(l_ref_s)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    G = groups
    k4 = pltpu.bitcast(k_ref[0, 0], jnp.int4).reshape(G, 128, chunk)
    q3 = q_ref[0]                                       # [G, fold, 128]
    scores = lax.dot_general(
        q3, k4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [G, fold, Sc]
    scores = scores * ks_ref[0, 0].astype(jnp.float32)
    scores = scores + bias_ref[0, 0].astype(jnp.float32)
    cols = c * chunk + lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(cols < cap, scores, -1e30)

    m_prev = m_ref[:]                                   # [G, fold, 1]
    l_prev = l_ref_s[:]
    m_c = jnp.max(scores, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_c)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                         # [G, fold, Sc]
    l_new = l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)

    pw = (p * vs_ref[0, 0].astype(jnp.float32)).astype(jnp.bfloat16)
    v4 = pltpu.bitcast(v_ref[0, 0], jnp.int4).reshape(G, 128, chunk)
    pv = lax.dot_general(
        pw, v4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [G, fold, 128]

    m_ref[:] = m_new
    l_ref_s[:] = l_new
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        acc_o_ref[0] = acc_ref[:]
        m_o_ref[0] = m_ref[:]
        l_o_ref[0] = l_ref_s[:]


@functools.partial(jax.jit, static_argnames=("chunk",))
def decode_attention_int4_stats(q, layer, k_all, v_all, k_scale, v_scale,
                                mask, chunk: int = 1024):
    """Unnormalized flash attention over layer `layer` of the packed cache.

    q: [B, H, 1, D] (rope'd, UNSCALED); layer: int32 scalar;
    k_all/v_all: [L, B, hd/2, cap_pad] int8 channel-pair packed;
    k_scale/v_scale: [L, B, H, cap]; mask: [B, cap] bool (logical cap).
    Returns (acc [B, H, D], m [B, H, 1], l [B, H, 1]) — f32, softmax NOT
    applied to anything outside the cache; combine with extra rows via
    standard flash-merge and divide by l."""
    B, H, T, D = q.shape
    assert T == 1
    cap_pad = k_all.shape[-1]
    cap = mask.shape[-1]  # logical; scales are stored padded like the cache
    assert cap_pad % 128 == 0 and cap_pad >= cap
    assert k_scale.shape[-1] == cap_pad, "scales must be lane-padded"
    hd = H * D
    chunk = max(d for d in range(128, min(chunk, cap_pad) + 1, 128)
                if cap_pad % d == 0)
    nc = cap_pad // chunk

    qf = (q[:, :, 0, :].astype(jnp.float32) / math.sqrt(D)).astype(jnp.bfloat16)
    if cap_pad > cap:
        mask = jnp.pad(mask, ((0, 0), (0, cap_pad - cap)))
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    if D < 128:
        # fold 128 // D heads into each 128-lane row block (see
        # _kernel_folded); requires hd % 128 == 0
        assert 128 % D == 0 and hd % 128 == 0, (H, D)
        fold = 128 // D
        G = hd // 128
        # q rows pre-placed in disjoint lane D-blocks, zeros elsewhere
        qr = qf.reshape(B, G, fold, D)
        qp = jnp.concatenate(
            [jnp.pad(qr[:, :, i:i + 1], ((0, 0), (0, 0), (0, 0),
                                         (i * D, 128 - (i + 1) * D)))
             for i in range(fold)], axis=2)            # [B, G, fold, 128]
        # [L, B, H, cap] -> [L, B, G, fold, cap]: splits a non-minor dim,
        # free (H = G*fold rows are already contiguous)
        L = k_scale.shape[0]
        ks5 = k_scale.reshape(L, B, G, fold, cap_pad)
        vs5 = v_scale.reshape(L, B, G, fold, cap_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nc),
            in_specs=[
                pl.BlockSpec((1, G, fold, 128), lambda b, c, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, hd // 2, chunk),
                             lambda b, c, s: (s[0], b, 0, c)),
                pl.BlockSpec((1, 1, hd // 2, chunk),
                             lambda b, c, s: (s[0], b, 0, c)),
                pl.BlockSpec((1, 1, G, fold, chunk),
                             lambda b, c, s: (s[0], b, 0, 0, c)),
                pl.BlockSpec((1, 1, G, fold, chunk),
                             lambda b, c, s: (s[0], b, 0, 0, c)),
                pl.BlockSpec((1, 1, chunk), lambda b, c, s: (b, 0, c)),
            ],
            out_specs=[
                pl.BlockSpec((1, G, fold, 128), lambda b, c, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, G, fold, 1), lambda b, c, s: (b, 0, 0, 0)),
                pl.BlockSpec((1, G, fold, 1), lambda b, c, s: (b, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((G, fold, 1), jnp.float32),
                pltpu.VMEM((G, fold, 1), jnp.float32),
                pltpu.VMEM((G, fold, 128), jnp.float32),
            ],
        )
        acc, m, l = pl.pallas_call(
            functools.partial(_kernel_folded, groups=G, fold=fold,
                              chunk=chunk, cap=cap),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, G, fold, 128), jnp.float32),
                jax.ShapeDtypeStruct((B, G, fold, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, G, fold, 1), jnp.float32),
            ],
        )(layer, qp, k_all, v_all, ks5, vs5, bias)
        # head g*fold+i's output lives at [g, i, i*D:(i+1)*D] (the PV dot
        # computed all (i, lane-block) combinations; select the diagonal)
        acc5 = acc.reshape(B, G, fold, fold, D)
        acc = jnp.stack([acc5[:, :, i, i] for i in range(fold)],
                        axis=2).reshape(B, H, D)
        return acc, m.reshape(B, H, 1), l.reshape(B, H, 1)

    # index_map convention: grid indices first, prefetch scalar refs last
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, c, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, hd // 2, chunk), lambda b, c, s: (s[0], b, 0, c)),
            pl.BlockSpec((1, 1, hd // 2, chunk), lambda b, c, s: (s[0], b, 0, c)),
            pl.BlockSpec((1, 1, H, chunk), lambda b, c, s: (s[0], b, 0, c)),
            pl.BlockSpec((1, 1, H, chunk), lambda b, c, s: (s[0], b, 0, c)),
            pl.BlockSpec((1, 1, chunk), lambda b, c, s: (b, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, D), lambda b, c, s: (b, 0, 0)),
            pl.BlockSpec((1, H, 1), lambda b, c, s: (b, 0, 0)),
            pl.BlockSpec((1, H, 1), lambda b, c, s: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        functools.partial(_kernel, heads=H, head_dim=D, chunk=chunk, cap=cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
        ],
    )(layer, qf, k_all, v_all, k_scale, v_scale, bias)
    return acc, m, l


def _write_kernel(pos_ref, kc, vc, ksc, vsc, k_in, v_in, ks_in, vs_in,
                  k_o, v_o, ks_o, vs_o):
    """Grid (L, B): read the 128-lane cache tile containing slot b's ring
    lane (block index from the prefetched positions), insert the new column,
    write it back in place (aliased outputs).

    The column operands arrive as [1, rows, B] blocks (B in the lane dim —
    the layout the layer scan's stacking already produced, so no relayout
    copy); the kernel selects slot b's lane with an iota mask + lane
    reduction.  The same (l, 0, 0) block index across the inner b loop means
    Pallas fetches each layer's columns once, not per slot."""
    b = pl.program_id(1)
    lane = pos_ref[b] % 128
    for colt, tile_in, tile_out in ((kc, k_in, k_o), (vc, v_in, v_o),
                                    (ksc, ks_in, ks_o), (vsc, vs_in, vs_o)):
        rows = tile_in.shape[2]
        nb = colt.shape[2]
        bsel = lax.broadcasted_iota(jnp.int32, (rows, nb), 1) == b
        col = jnp.sum(jnp.where(bsel, colt[0].astype(jnp.float32), 0.0),
                      axis=1, keepdims=True)                 # [rows, 1]
        col = col.astype(tile_in.dtype)
        sel = lax.broadcasted_iota(jnp.int32, (rows, 128), 1) == lane
        tile_out[0, 0] = jnp.where(sel, col, tile_in[0, 0])


@jax.jit
def cache_write_int4(pos, kcols, vcols, kscols, vscols,
                     k_all, v_all, ks_all, vs_all):
    """Write one frame's quantized columns into the packed caches in place.

    pos: [B] int32 ring lanes; kcols/vcols: [L, B, hd/2] int8;
    kscols/vscols: [L, B, H] bf16; caches as in decode_attention_int4_stats.
    Returns the four updated caches (aliased).  Each grid step rewrites only
    the 128-lane tile containing the slot's ring lane — XLA\'s
    dynamic-update-slice at an arbitrary lane rewrites the whole lane extent
    instead (~4 ms/frame at B=8; this kernel moves ~0.3 MB per slot-layer).
    The columns are passed B-minor ([L, rows, B] via transpose): the scan
    stack is already laid out B-minor, so the transpose is a free bitcast —
    feeding [L, B, rows, 1] blocks instead forced XLA into a pathological
    lane<->sublane relayout copy (1.6 ms per 4 MB operand at B=64, seen in
    a device profile).
    """
    L, B, hd2 = kcols.shape
    H = kscols.shape[-1]

    def tile_spec(rows):
        return pl.BlockSpec((1, 1, rows, 128),
                            lambda l, b, s: (l, b, 0, s[b] // 128))

    def col_spec(rows):
        return pl.BlockSpec((1, rows, B), lambda l, b, s: (l, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=[
            col_spec(hd2), col_spec(hd2), col_spec(H), col_spec(H),
            tile_spec(hd2), tile_spec(hd2), tile_spec(H), tile_spec(H),
        ],
        out_specs=[
            tile_spec(hd2), tile_spec(hd2), tile_spec(H), tile_spec(H),
        ],
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
            jax.ShapeDtypeStruct(ks_all.shape, ks_all.dtype),
            jax.ShapeDtypeStruct(vs_all.shape, vs_all.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
    )(pos, kcols.transpose(0, 2, 1), vcols.transpose(0, 2, 1),
      kscols.transpose(0, 2, 1), vscols.transpose(0, 2, 1),
      k_all, v_all, ks_all, vs_all)
