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
    assert q.q.dtype == jnp.int8 and q.q.shape == (4, 1, 32, 128)  # two-plane packed
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
    """Fused two-plane unpack kernel (interpret mode) vs QTensor4.astype."""
    from moshi_tpu.utils.quantize import quantize_tensor4
    from moshi_tpu.ops.q4matmul import q4gemm

    rs = np.random.RandomState(0)
    for B, din, dout in ((1, 256, 384), (4, 512, 256)):
        w = jnp.asarray(rs.randn(din, dout).astype(np.float32))
        qt = quantize_tensor4(w, group_size=32)
        # the kernel dequantizes to bf16 in-register by design
        x = jnp.asarray(rs.randn(B, din).astype(np.float32), jnp.bfloat16)
        y_ref = jnp.matmul(x, qt.astype(jnp.bfloat16))
        y = q4gemm(x, qt.q, qt.scale, block_in=128, block_out=128,
                   interpret=True)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(y_ref, np.float32),
                                   rtol=1e-5, atol=1e-5)


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
