"""Batched desynchronized-users invariant: per-slot exec masks over streaming
Mimi encode/decode and LMGen must match per-item reference runs — the analog
of the reference's `scripts/test_missing_data.py` / `test_missing_data_lm.py`."""

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.mimi import MimiModel
from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
from moshi_tpu.utils.trees import masked_reset
from test_mimi import tiny_mimi_config
from test_lm import tiny_lm_config


def test_mimi_exec_mask_desync():
    cfg = tiny_mimi_config()
    model = MimiModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    B, nframes = 3, 8
    fs = cfg.frame_size
    rs = np.random.RandomState(0)
    # per-item schedule of which frames execute
    exec_sched = rs.rand(B, nframes) > 0.3
    exec_sched[:, 0] = True
    pcm = rs.randn(B, 1, nframes * fs).astype(np.float32) * 0.3

    # batched run with masks: frame f uses input frame count[i] for item i
    enc_state = model.init_encode_state(B)
    counts = np.zeros(B, int)
    codes_batched = [[] for _ in range(B)]
    for f in range(nframes):
        mask = exec_sched[:, f]
        chunk = np.stack([pcm[b, :, counts[b] * fs:(counts[b] + 1) * fs]
                          for b in range(B)])
        codes, enc_state = model.encode_step(params, enc_state,
                                             jnp.asarray(chunk),
                                             jnp.asarray(mask))
        for b in range(B):
            if mask[b]:
                codes_batched[b].append(np.asarray(codes[b]))
                counts[b] += 1

    # per-item reference runs
    for b in range(B):
        n = counts[b]
        state = model.init_encode_state(1)
        ref = []
        for f in range(n):
            c, state = model.encode_step(params, state,
                                         jnp.asarray(pcm[b:b + 1, :, f * fs:(f + 1) * fs]))
            ref.append(np.asarray(c[0]))
        got = np.stack(codes_batched[b])
        np.testing.assert_array_equal(got, np.stack(ref), err_msg=f"item {b}")


def test_lmgen_exec_mask_desync():
    cfg = tiny_lm_config()
    model = LMModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = LMGen(model, LMGenConfig(use_sampling=False))
    B, nsteps = 2, 10
    n_in = cfg.num_codebooks - cfg.dep_q - 1
    rs = np.random.RandomState(0)
    tokens = rs.randint(0, cfg.card, (B, n_in, nsteps)).astype(np.int32)
    exec_sched = rs.rand(B, nsteps) > 0.3
    exec_sched[:, 0] = True

    state = gen.init_state(B, jax.random.PRNGKey(1), dtype=jnp.float32)
    counts = np.zeros(B, int)
    outs_batched = [[] for _ in range(B)]
    for s in range(nsteps):
        mask = exec_sched[:, s]
        it = np.stack([tokens[b, :, counts[b]:counts[b] + 1] for b in range(B)])
        out, state = gen.step(params, state, jnp.asarray(it), jnp.asarray(mask))
        for b in range(B):
            if mask[b]:
                outs_batched[b].append(np.asarray(out[b]))
                counts[b] += 1

    for b in range(B):
        n = counts[b]
        st = gen.init_state(1, jax.random.PRNGKey(1), dtype=jnp.float32)
        ref = []
        for s in range(n):
            o, st = gen.step(params, st, jnp.asarray(tokens[b:b + 1, :, s:s + 1]))
            ref.append(np.asarray(o[0]))
        np.testing.assert_array_equal(np.stack(outs_batched[b]), np.stack(ref),
                                      err_msg=f"item {b}")


def test_per_slot_reset():
    """masked_reset on one slot must restart that slot's stream exactly while
    leaving others untouched (reference reset_streaming(reset_mask),
    streaming.py:183-211; kv_cache.rs:92-95)."""
    cfg = tiny_mimi_config()
    model = MimiModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    B, fs = 2, cfg.frame_size
    rs = np.random.RandomState(0)
    pcm = rs.randn(B, 1, 6 * fs).astype(np.float32) * 0.3

    state = model.init_encode_state(B)
    for f in range(3):
        _, state = model.encode_step(params, state,
                                     jnp.asarray(pcm[:, :, f * fs:(f + 1) * fs]))
    # reset slot 1 only
    reset_mask = jnp.asarray([False, True])
    state = masked_reset(state, model.init_encode_state(B), reset_mask)

    codes, state = model.encode_step(params, state,
                                     jnp.asarray(pcm[:, :, 3 * fs:4 * fs]))

    # slot 1 must equal a fresh single-item stream on the same chunk
    fresh = model.init_encode_state(1)
    ref, _ = model.encode_step(params, fresh, jnp.asarray(pcm[1:2, :, 3 * fs:4 * fs]))
    np.testing.assert_array_equal(np.asarray(codes[1]), np.asarray(ref[0]))

    # slot 0 must equal the uninterrupted stream
    st0 = model.init_encode_state(1)
    for f in range(4):
        ref0, st0 = model.encode_step(params, st0,
                                      jnp.asarray(pcm[0:1, :, f * fs:(f + 1) * fs]))
    np.testing.assert_array_equal(np.asarray(codes[0]), np.asarray(ref0[0]))


def test_int4_kv_exec_mask_freeze():
    """Frozen slots over the int4 decode path (deferred writes + current-row
    injection) must keep their stream bit-exact vs stepping alone."""
    from dataclasses import replace
    from moshi_tpu.modules.transformer import (TransformerConfig,
                                               StreamingTransformer)

    cfg = TransformerConfig(d_model=64, num_heads=4, num_layers=2,
                            dim_feedforward=256, causal=True, context=16,
                            positional_embedding="rope", gating="silu",
                            norm="rms_norm_f32", kv_cache_dtype="int4")
    tr = StreamingTransformer(cfg)
    params = tr.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    B, T = 2, 10
    rs = np.random.RandomState(0)
    x = rs.randn(B, T, cfg.d_model).astype(np.float32) * 0.5
    sched = rs.rand(B, T) > 0.3
    sched[:, 0] = True

    # batched run with per-slot freeze
    st = tr.init_state(B, dtype=jnp.float32)
    counts = np.zeros(B, int)
    got = [[] for _ in range(B)]
    for t in range(T):
        mask = sched[:, t]
        chunk = np.stack([x[b, counts[b]][None] for b in range(B)])
        y, st = tr.step(params, st, jnp.asarray(chunk),
                        exec_mask=jnp.asarray(mask))
        for b in range(B):
            if mask[b]:
                got[b].append(np.asarray(y[b]))
                counts[b] += 1

    # per-item reference runs (batch of 1, no mask)
    for b in range(B):
        st1 = tr.init_state(1, dtype=jnp.float32)
        for i in range(counts[b]):
            y1, st1 = tr.step(params, st1, jnp.asarray(x[b, i][None, None]))
            np.testing.assert_allclose(np.asarray(y1[0]), got[b][i],
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"slot {b} step {i}")
