"""Benchmark: full-duplex frame step (Mimi encode -> LM step -> Mimi decode).

Measures the p50 wall-clock per 80 ms frame on the available accelerator and
prints ONE JSON line {metric, value, unit, vs_baseline}.  Baseline: the
reference's real-time budget of 80 ms/frame (BASELINE.md; the Rust benchmark
paces frames at 80 ms: rust/moshi-backend/src/benchmark.rs:130).

vs_baseline is the fraction of the 80 ms budget used (lower is better;
< 1.0 = real-time capable).

Default flagship: Moshi 7B (configs/moshi_7b_202409.json shapes) with int8
weights — bf16 at ~15 GB does not fit a 16 GB v5e (the reference itself needs
a 24 GB GPU in bf16, README.md:108); per-output-channel int8 does, at
~49 ms/frame.  `moshi_2b` (bf16) and `moshi_7b` (bf16) variants selectable by
argv[1].
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def zeros_like_tree(tree):
    return jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), tree)


def build_lm(name: str):
    from moshi_tpu.models.lm import LmConfig, LMModel
    quant_mode = None
    for suffix in ("_int8", "_int4"):
        if name.endswith(suffix):
            quant_mode = suffix[1:]
            name = name.removesuffix(suffix)
    quantized = quant_mode is not None
    if name == "moshi_7b":
        from moshi_tpu.models.loaders import lm_config_v0_1
        config = lm_config_v0_1()
    elif name == "moshi_2b":
        config = LmConfig(
            dim=2560, text_card=48000, n_q=32, dep_q=16, card=2048, num_heads=20,
            num_layers=24, hidden_scale=4.125, context=3000, max_period=100000.0,
            gating="silu", norm="rms_norm_f32", positional_embedding="rope",
            depformer_dim=1024, depformer_dim_feedforward=4224,
            depformer_num_heads=16, depformer_num_layers=6,
            delays=tuple([0, 0] + [2] * 15 + [0] + [2] * 15))
    else:
        raise ValueError(name)
    model = LMModel(config)
    init = lambda k: model.init_params(k, jnp.bfloat16)  # noqa: E731
    if quantized:
        from moshi_tpu.utils.quantize import quantize_lm_params
        init_q = lambda k: quantize_lm_params(init(k), mode=quant_mode)  # noqa: E731
        shapes = jax.eval_shape(init_q, jax.random.PRNGKey(0))
    else:
        shapes = jax.eval_shape(init, jax.random.PRNGKey(0))
    return model, zeros_like_tree(shapes)


def build_mimi(num_codebooks: int, dtype=jnp.float32):
    from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
    model = MimiModel(mimi_v0_1_config(num_codebooks=num_codebooks))
    shapes = jax.eval_shape(lambda k: model.init_params(k, dtype),
                            jax.random.PRNGKey(0))
    params = zeros_like_tree(shapes)
    return model, params


def bench_full_duplex(lm_name: str = "moshi_2b", steps: int = 50,
                      warmup: int = 10) -> dict:
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    # bf16 codec: the recommended serving config (--mimi-dtype bf16,
    # BENCH_BATCH.md) — ~0.6 ms/frame at B=1, up to 18 ms at B=64
    mimi_dtype = jnp.float32
    metric_name = lm_name
    if lm_name.endswith("_bf16mimi"):
        lm_name = lm_name.removesuffix("_bf16mimi")
        mimi_dtype = jnp.bfloat16
    lm, lm_params = build_lm(lm_name)
    c = lm.config
    n_in = c.num_codebooks - c.dep_q - 1
    mimi, mimi_params = build_mimi(max(c.dep_q, n_in), mimi_dtype)
    gen = LMGen(lm, LMGenConfig(use_sampling=True))

    B = 1
    fs = mimi.frame_size
    lm_state = gen.init_state(B, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    enc_state = mimi.init_encode_state(B, mimi_dtype)
    dec_state = mimi.init_decode_state(B, mimi_dtype)

    # donate the streaming states: without donation XLA must copy the ring
    # KV cache every step instead of scattering in place (~4 ms/frame at
    # B=1 ctx 3000, and an OOM at batch — see BENCH_BATCH.md)
    import functools

    @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
    def frame(lm_params, mimi_params, lm_state, enc_state, dec_state, pcm):
        codes, enc_state = mimi.encode_step(mimi_params, enc_state, pcm)
        kin = codes[:, :n_in] if codes.shape[1] >= n_in else jnp.tile(codes, (1, n_in, 1))
        out, lm_state = gen.step(lm_params, lm_state, kin)
        audio_codes = jnp.clip(out[:, 1:1 + mimi.num_codebooks], 0, None)
        pcm_out, dec_state = mimi.decode_step(mimi_params, dec_state, audio_codes)
        return lm_state, enc_state, dec_state, pcm_out

    pcm = jnp.zeros((B, 1, fs), mimi_dtype)
    for _ in range(warmup):
        lm_state, enc_state, dec_state, pcm_out = frame(
            lm_params, mimi_params, lm_state, enc_state, dec_state, pcm)
    jax.block_until_ready(pcm_out)

    # Sustained (pipelined) ms/frame: frames are chained through the streaming
    # state, so each step truly depends on the previous one; the host only
    # syncs at the end.  This matches the serving design (the reference
    # pipelines mimi-encode / LM / mimi-decode across threads,
    # rust/moshi-backend/src/stream_both.rs:447-545) and excludes the
    # host<->device round-trip latency of this dev environment's tunneled TPU.
    import numpy as np
    t0 = time.perf_counter()
    for _ in range(steps):
        lm_state, enc_state, dec_state, pcm_out = frame(
            lm_params, mimi_params, lm_state, enc_state, dec_state, pcm)
    np.asarray(pcm_out)
    sustained = (time.perf_counter() - t0) * 1000.0 / steps
    return {"metric": f"{metric_name}_full_duplex_step_ms", "value": round(sustained, 3),
            "unit": "ms", "vs_baseline": round(sustained / 80.0, 4)}


def main():
    # q4 (int4-bitcast Pallas kernel, depformer int8) is the fastest B=1
    # config: 19.7 ms/frame vs 21.0 for int8 (BENCH_BATCH.md), at 4 GB
    # weights; the reference's own MLX stack serves q4 as a first-class mode.
    lm_name = sys.argv[1] if len(sys.argv) > 1 else "moshi_7b_int4_bf16mimi"
    try:
        result = bench_full_duplex(lm_name)
    except Exception as e:  # noqa: BLE001 — fall back to a smaller model on OOM
        print(f"bench {lm_name} failed ({type(e).__name__}: {e}); "
              "falling back to moshi_2b", file=sys.stderr)
        result = bench_full_duplex("moshi_2b")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
