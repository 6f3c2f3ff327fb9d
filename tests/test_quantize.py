"""Int8 weight quantization: numeric sanity + quantized model runs a full
generation step with close logits."""

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.utils.quantize import QTensor, quantize_tensor, quantize_lm_params
from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
from test_lm import tiny_lm_config


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    q = quantize_tensor(w)
    assert q.q.dtype == jnp.int8
    err = jnp.abs(q.astype(jnp.float32) - w).max() / jnp.abs(w).max()
    assert float(err) < 1.0 / 100  # 127 levels per channel


def test_quantize4_roundtrip():
    from moshi_tpu.utils.quantize import quantize_tensor4, QTensor4
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 128)) * 0.05
    q = quantize_tensor4(w, 32)
    assert q.shape == (4, 64, 128)
    assert q.q.dtype == jnp.int8 and q.q.shape == (4, 32, 128)  # pair-packed
    err = jnp.abs(q.astype(jnp.float32) - w).max() / jnp.abs(w).max()
    assert float(err) < 0.12  # 15 levels per group
    sub = q[1]
    np.testing.assert_allclose(np.asarray(sub.astype(jnp.float32)),
                               np.asarray(q.astype(jnp.float32)[1]), rtol=1e-6)


def test_quantized4_lm_runs():
    from moshi_tpu.utils.quantize import quantize_lm_params, QTensor4
    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_lm_params(params, min_size=1, mode="int4", group_size=16)
    assert isinstance(qparams["transformer"]["layers"]["attn"]["in_proj"], QTensor4)
    gen = LMGen(model, LMGenConfig(use_sampling=False))
    B = 1
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    st = gen.init_state(B, jax.random.PRNGKey(1), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(2), (B, n_in, 1), 0, cfg.card)
    for _ in range(4):
        out, st = gen.step(qparams, st, toks)
    assert np.asarray(out).shape == (B, cfg.dep_q + 1, 1)


def test_qtensor_indexing():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16))
    q = quantize_tensor(w)
    sub = q[1]
    assert sub.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(sub.astype(jnp.float32)),
                               np.asarray(q.astype(jnp.float32)[1]), rtol=1e-6)
    tk = q.take(jnp.array([2, 0]), axis=0)
    assert tk.shape == (2, 8, 16)


def test_quantized_lm_step_close_to_fp():
    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_lm_params(params, min_size=1)
    # embeddings must stay unquantized
    assert not isinstance(qparams["text_emb"]["weight"], QTensor)
    assert isinstance(qparams["transformer"]["layers"]["attn"]["in_proj"], QTensor)

    gen = LMGen(model, LMGenConfig(use_sampling=False))
    B, T = 1, 6
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, n_in, T), 0, cfg.card)

    s_fp = gen.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
    s_q = gen.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
    agree = 0
    total = 0
    for t in range(T):
        it = tokens[:, :, t:t + 1]
        o1, s_fp = gen.step(params, s_fp, it)
        o2, s_q = gen.step(qparams, s_q, it)
        a, b = np.asarray(o1), np.asarray(o2)
        agree += (a == b).sum()
        total += a.size
    # greedy decode streams drift eventually, but early agreement should be high
    assert agree / total > 0.5, (agree, total)


def test_q4gemm_kernel_matches_astype():
    """Fused int4-bitcast kernel (interpret mode) vs an exact f32 grouped
    reference.  The kernel's math is exact up to f32 accumulation order: the
    nibble ints are bf16-representable and the group scales are applied in
    f32 AFTER the dot (per-group post-dot scaling), unlike `astype(bf16)`
    which rounds each dequantized weight to bf16."""
    from moshi_tpu.utils.quantize import quantize_tensor4, unpack_nibbles
    from moshi_tpu.ops.q4matmul import q4gemm

    rs = np.random.RandomState(0)
    for B, din, dout in ((1, 256, 384), (4, 512, 256)):
        w = jnp.asarray(rs.randn(din, dout).astype(np.float32))
        qt = quantize_tensor4(w, group_size=32)
        x = jnp.asarray(rs.randn(B, din).astype(np.float32), jnp.bfloat16)
        # f32 grouped reference with the same scale placement as the kernel
        low, high = unpack_nibbles(qt.q)
        ints = np.stack([np.asarray(low), np.asarray(high)],
                        axis=-2).reshape(din, dout).astype(np.float32)
        G = qt.scale.shape[0]
        p = np.einsum("bgi,gio->bgo",
                      np.asarray(x, np.float32).reshape(B, G, din // G),
                      ints.reshape(G, din // G, dout))
        y_ref = (p * np.asarray(qt.scale).transpose(1, 0, 2)).sum(axis=1)
        y = q4gemm(x, qt.q, qt.scale, block_in=128, block_out=128,
                   interpret=True)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   y_ref.astype(np.float32),
                                   rtol=2e-2, atol=1e-3)
        # and the XLA astype fallback agrees to bf16 rounding
        y_xla = jnp.matmul(x, qt.astype(jnp.bfloat16))
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(y_xla, np.float32),
                                   rtol=3e-2, atol=0.3)


def test_wdot_dispatch_fallback():
    """wdot on CPU falls back to the XLA astype path for all leaf kinds."""
    from moshi_tpu.utils.matmul import wdot
    from moshi_tpu.utils.quantize import quantize_tensor, quantize_tensor4

    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(256, 128).astype(np.float32))
    x = jnp.asarray(rs.randn(2, 3, 256).astype(np.float32))
    y_plain = wdot(x, w)
    assert y_plain.shape == (2, 3, 128)
    y8 = wdot(x, quantize_tensor(w))
    y4 = wdot(x, quantize_tensor4(w))
    # quantization error only
    ref = np.asarray(jnp.matmul(x, w))
    assert np.abs(np.asarray(y8) - ref).max() / np.abs(ref).max() < 0.05
    assert np.abs(np.asarray(y4) - ref).max() / np.abs(ref).max() < 0.2


def test_legacy_q4_repack():
    """Round-2 two-plane packed checkpoints load into the sequential-pair
    format with identical dequantized values (native_ckpt migration)."""
    from moshi_tpu.utils.quantize import quantize_tensor4, repack_legacy_q4

    rs = np.random.RandomState(3)
    w = jnp.asarray(rs.randn(2, 128, 64).astype(np.float32) * 0.05)
    qt = quantize_tensor4(w, 32)
    # rebuild the legacy two-plane layout from the current one
    deq = qt.astype(jnp.float32)
    *lead, din, dout = deq.shape
    G = qt.scale.shape[-3]
    gs = din // G
    ints = jnp.round(deq.reshape(*lead, G, gs, dout)
                     / qt.scale.astype(jnp.float32)).astype(jnp.int32)
    low = ints[..., : G // 2, :, :]
    high = ints[..., G // 2:, :, :]
    legacy_q = jnp.bitwise_or(jnp.bitwise_and(low, 0x0F),
                              jnp.left_shift(jnp.bitwise_and(high, 0x0F), 4)
                              ).astype(jnp.int8)
    assert legacy_q.ndim == qt.scale.ndim  # the legacy detection invariant
    migrated = repack_legacy_q4(legacy_q, qt.scale)
    np.testing.assert_array_equal(np.asarray(migrated.q), np.asarray(qt.q))
    np.testing.assert_allclose(np.asarray(migrated.astype(jnp.float32)),
                               np.asarray(deq), rtol=1e-6)


def test_q4gemm_stacked_matches_member():
    """q4gemm_stacked (scalar-prefetch member indexing, interpret mode) ==
    q4gemm on the sliced member, for every member."""
    from moshi_tpu.utils.quantize import quantize_tensor4
    from moshi_tpu.ops.q4matmul import q4gemm, q4gemm_stacked

    rs = np.random.RandomState(1)
    ws = jnp.asarray(rs.randn(3, 256, 128).astype(np.float32) * 0.1)
    qt = quantize_tensor4(ws, group_size=32)
    x = jnp.asarray(rs.randn(2, 256).astype(np.float32), jnp.bfloat16)
    for n in range(3):
        a = q4gemm(x, qt.q[n], qt.scale[n], block_in=128, block_out=128,
                   interpret=True)
        b = q4gemm_stacked(x, qt.q, qt.scale, jnp.int32(n), block_in=128,
                           block_out=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_qtensor4_ref_view():
    """QTensor4Ref indexes a stacked q4 leaf lazily: shape bookkeeping, lead
    folding ([W] axis), and the materializing astype fallback must all agree
    with plain slicing; wdot on a ref == wdot on the slice (CPU path)."""
    from moshi_tpu.utils.quantize import quantize_tensor4, QTensor4Ref
    from moshi_tpu.utils.matmul import wdot

    rs = np.random.RandomState(2)
    # [L=3, W=2, din=128, dout=64] per-layer per-step stack
    ws = jnp.asarray(rs.randn(3, 2, 128, 64).astype(np.float32) * 0.1)
    qt = quantize_tensor4(ws, group_size=32)
    x = jnp.asarray(rs.randn(5, 128).astype(np.float32))

    for layer in range(3):
        ref = QTensor4Ref.from_stack(qt, jnp.int32(layer))
        assert ref.shape == (2, 128, 64)
        for w_idx in range(2):
            r2 = ref[w_idx]
            assert r2.shape == (128, 64)
            want = np.asarray(qt[layer][w_idx].astype(jnp.float32))
            got = np.asarray(r2.astype(jnp.float32))
            np.testing.assert_array_equal(got, want)
            np.testing.assert_allclose(np.asarray(wdot(x, r2)),
                                       np.asarray(wdot(x, qt[layer][w_idx])),
                                       rtol=1e-5)


def test_q4_lm_step_stacked_vs_unstacked():
    """The layer-scan q4 split (_split_q4_layers + QTensor4Ref) must not
    change a quantized LM's greedy stream (CPU fallback materializes the
    same slices, so the outputs are bit-identical)."""
    import moshi_tpu.modules.transformer as mtr

    cfg = tiny_lm_config()
    lm = LMModel(cfg)
    params = quantize_lm_params(
        lm.init_params(jax.random.PRNGKey(0), jnp.float32), min_size=1,
        mode="int4", group_size=8)
    gen = LMGen(lm, LMGenConfig(use_sampling=False))
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    toks = jnp.zeros((1, n_in, 1), jnp.int32)

    def stream():
        st = gen.init_state(1, jax.random.PRNGKey(1), dtype=jnp.float32)
        outs = []
        for _ in range(cfg.max_delay + 3):
            out, st = gen.step(params, st, toks)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=-1)

    a = stream()
    # force the identity path (as if no q4 leaves) and compare
    orig = mtr._split_q4_layers
    mtr._split_q4_layers = lambda layers: (layers, lambda xs, l: xs)
    try:
        b = stream()
    finally:
        mtr._split_q4_layers = orig
    np.testing.assert_array_equal(a, b)
