"""On-chip correctness checks for the Pallas TPU kernels.

CPU tests cover the XLA fallback paths; the kernels themselves
(`pltpu.bitcast` int4 reinterpretation, scalar-prefetch layer indexing,
aliased in-place cache writes) only run on real TPU hardware — run this
after any change under `moshi_tpu/ops/`:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_tpu_kernels.py

Checks (all against independent numpy math / XLA programs):
1. decode_attention_int4_stats: flash stats over a packed multi-layer cache
   vs float64 attention, per layer.
2. cache_write_int4: aliased in-place tile writes vs the
   dynamic-update-slice chain, bit-exact, ring lanes crossing tile edges.
3. q4gemm: int4-bitcast group dots vs dense dequantized matmul.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def check_decode_attention(H=4, D=128, cap=96):
    from moshi_tpu.ops.int4_attention import decode_attention_int4_stats

    L, B = 2, 3
    hd = H * D
    cap_pad = -(-cap // 128) * 128
    rs = np.random.RandomState(0)
    kv = rs.randint(-7, 8, size=(2, L, B, cap, H, D)).astype(np.int8)

    def pack_cm(x):  # [L, B, cap, H, D] -> [L, B, hd/2, cap_pad] channel-pair
        f = x.reshape(L, B, cap, hd).transpose(0, 1, 3, 2)
        p = ((f[:, :, 1::2] << 4) | (f[:, :, 0::2] & 0x0F)).astype(np.int8)
        return np.pad(p, ((0, 0), (0, 0), (0, 0), (0, cap_pad - cap)))

    kp, vp = pack_cm(kv[0]), pack_cm(kv[1])
    q = rs.randn(B, H, 1, D).astype(np.float32) * 0.5
    ks = rs.rand(L, B, H, cap_pad).astype(np.float32) * 0.1 + 0.01
    vs = rs.rand(L, B, H, cap_pad).astype(np.float32) * 0.1 + 0.01
    mask = rs.rand(B, cap) > 0.3
    mask[:, :2] = True

    worst = 0.0
    for layer in range(L):
        acc, m, l = decode_attention_int4_stats(
            jnp.asarray(q, jnp.bfloat16), layer, jnp.asarray(kp),
            jnp.asarray(vp), jnp.asarray(ks, jnp.bfloat16),
            jnp.asarray(vs, jnp.bfloat16), jnp.asarray(mask))
        out = np.asarray(acc / l)  # normalized attention [B, H, D]

        kf = kv[0, layer].astype(np.float64)
        vf = kv[1, layer].astype(np.float64)
        scores = np.einsum("bhtd,bshd->bhts", q.astype(np.float64), kf)
        scores = scores / np.sqrt(D) * ks[layer][:, :, None, :cap]
        scores = np.where(mask[:, None, None, :], scores, -1e30)
        w = np.exp(scores - scores.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        w = w * vs[layer][:, :, None, :cap]
        ref = np.einsum("bhts,bshd->bhd", w, vf)
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        worst = max(worst, err)
    assert worst < 0.02, worst
    print(f"decode_attention_int4_stats OK (max rel err {worst:.2e})")


def check_cache_write():
    from moshi_tpu.ops.int4_attention import cache_write_int4

    rng = np.random.default_rng(0)
    L, B, H, D = 4, 8, 32, 64
    hd2 = H * D // 2
    cap_pad = 3072
    k_all = jnp.asarray(rng.integers(-128, 128, (L, B, hd2, cap_pad),
                                     dtype=np.int8))
    v_all = jnp.asarray(rng.integers(-128, 128, (L, B, hd2, cap_pad),
                                     dtype=np.int8))
    ks_all = jnp.asarray(rng.standard_normal((L, B, H, cap_pad)), jnp.bfloat16)
    vs_all = jnp.asarray(rng.standard_normal((L, B, H, cap_pad)), jnp.bfloat16)
    kcols = jnp.asarray(rng.integers(-128, 128, (L, B, hd2), dtype=np.int8))
    vcols = jnp.asarray(rng.integers(-128, 128, (L, B, hd2), dtype=np.int8))
    kscols = jnp.asarray(rng.standard_normal((L, B, H)), jnp.bfloat16)
    vscols = jnp.asarray(rng.standard_normal((L, B, H)), jnp.bfloat16)
    # ring lanes spanning tile boundaries and edges
    wp = jnp.asarray([0, 1, 127, 128, 129, 2047, 2999, 1536], jnp.int32)

    def ref(wp, kcols, vcols, kscols, vscols, k_all, v_all, ks_all, vs_all):
        for b in range(B):
            pos = wp[b]
            k_all = lax.dynamic_update_slice(
                k_all, kcols[:, b].reshape(L, 1, hd2, 1), (0, b, 0, pos))
            v_all = lax.dynamic_update_slice(
                v_all, vcols[:, b].reshape(L, 1, hd2, 1), (0, b, 0, pos))
            ks_all = lax.dynamic_update_slice(
                ks_all, kscols[:, b].reshape(L, 1, H, 1), (0, b, 0, pos))
            vs_all = lax.dynamic_update_slice(
                vs_all, vscols[:, b].reshape(L, 1, H, 1), (0, b, 0, pos))
        return k_all, v_all, ks_all, vs_all

    r = jax.jit(ref)(wp, kcols, vcols, kscols, vscols,
                     k_all, v_all, ks_all, vs_all)
    g = cache_write_int4(wp, kcols, vcols, kscols, vscols,
                         k_all, v_all, ks_all, vs_all)
    for name, a, b in zip(("k", "v", "k_scale", "v_scale"), r, g):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    print("cache_write_int4 OK (bit-exact vs DUS chain)")


def check_q4gemm():
    from moshi_tpu.ops.q4matmul import q4gemm

    rs = np.random.RandomState(1)
    B, din, dout, gs = 4, 512, 1024, 32
    w4 = rs.randint(-8, 8, size=(din, dout)).astype(np.int8)
    packed = ((w4[1::2] << 4) | (w4[0::2] & 0x0F)).astype(np.int8)
    scale = (rs.rand(din // gs, 1, dout).astype(np.float32) * 0.1 + 0.01)
    x = rs.randn(B, din).astype(np.float32) * 0.5

    y = np.asarray(q4gemm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(packed),
                          jnp.asarray(scale)), np.float32)
    wd = w4.astype(np.float64) * np.repeat(scale[:, 0, :], gs, axis=0)
    ref = x.astype(np.float64) @ wd
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err
    print(f"q4gemm OK (max rel err {err:.2e})")


if __name__ == "__main__":
    if jax.devices()[0].platform not in ("tpu", "axon"):
        print("no TPU available — these kernels only run on real hardware",
              file=sys.stderr)
        sys.exit(1)
    check_decode_attention()
    # head_dim 64 (tts_v0_1: 32 heads x 64) takes the folded-lane kernel
    check_decode_attention(H=32, D=64, cap=200)
    check_cache_write()
    check_q4gemm()
    print("all TPU kernel checks passed")
