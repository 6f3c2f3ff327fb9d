"""Batched-serving benchmark: full-duplex frame step at batch B on one chip.

Measures the sustained (state-chained, single final sync) ms/frame of the
whole batched frame — mimi encode + LM step + mimi decode for B concurrent
users — exactly the jitted program `serve/batched_moshi.py` runs.  Reports
ms/user and real-time users/chip (80 ms budget / ms-per-frame * B).

Run one combo:    python scripts/bench_batch.py 8 int8
Run the sweep:    python scripts/bench_batch.py sweep
(each combo runs in its own subprocess so HBM is returned between runs)

Reference envelope to beat: the production ASR step-duration histogram
buckets 20-80 ms (rust/moshi-server/src/metrics.rs:21-25).
"""

import functools
import json
import subprocess
import sys
import time


def run_combo(batch: int, kv: str, context: int = 3000,
              weights: str = "int8", steps: int = 30, warmup: int = 5,
              mimi_dtype: str = "f32") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
    from moshi_tpu.models.loaders import lm_config_v0_1
    from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
    from moshi_tpu.utils.quantize import quantize_lm_params
    from dataclasses import replace

    config = replace(lm_config_v0_1(), kv_cache_dtype=kv.removesuffix("qk"),
                     context=context, attention_int8_qk=kv.endswith("qk"))
    lm = LMModel(config)
    shapes = jax.eval_shape(
        lambda k: quantize_lm_params(lm.init_params(k, jnp.bfloat16), mode=weights),
        jax.random.PRNGKey(0))
    lm_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    md = jnp.bfloat16 if mimi_dtype == "bf16" else jnp.float32
    mimi = MimiModel(mimi_v0_1_config(num_codebooks=config.dep_q))
    mshapes = jax.eval_shape(lambda k: mimi.init_params(k, md),
                             jax.random.PRNGKey(0))
    mimi_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), mshapes)

    gen = LMGen(lm, LMGenConfig(use_sampling=True))
    B = batch
    n_in = config.num_codebooks - config.dep_q - 1
    fs = mimi.frame_size

    lm_state = gen.init_state(B, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    enc_state = mimi.init_encode_state(B, md)
    dec_state = mimi.init_decode_state(B, md)

    # donate the streaming states: without donation the KV cache exists
    # twice (input + output buffers) during the step, which halves the max
    # batch that fits in HBM
    @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
    def frame(lm_params, mimi_params, lm_state, enc_state, dec_state, pcm):
        codes, enc_state = mimi.encode_step(mimi_params, enc_state,
                                            pcm.astype(md))
        kin = codes[:, :n_in] if codes.shape[1] >= n_in else jnp.tile(codes, (1, n_in, 1))
        out, lm_state = gen.step(lm_params, lm_state, kin)
        audio_codes = jnp.clip(out[:, 1:1 + mimi.num_codebooks], 0, None)
        pcm_out, dec_state = mimi.decode_step(mimi_params, dec_state, audio_codes)
        return lm_state, enc_state, dec_state, pcm_out

    pcm = jnp.zeros((B, 1, fs), jnp.float32)
    import numpy as np
    for _ in range(warmup):
        lm_state, enc_state, dec_state, pcm_out = frame(
            lm_params, mimi_params, lm_state, enc_state, dec_state, pcm)
    jax.block_until_ready(pcm_out)

    t0 = time.perf_counter()
    for _ in range(steps):
        lm_state, enc_state, dec_state, pcm_out = frame(
            lm_params, mimi_params, lm_state, enc_state, dec_state, pcm)
    np.asarray(pcm_out)
    ms = (time.perf_counter() - t0) * 1000.0 / steps
    return {
        "batch": B, "kv_cache": kv, "context": context, "weights": weights,
        "mimi": mimi_dtype,
        "ms_per_frame": round(ms, 3),
        "ms_per_user": round(ms / B, 3),
        "users_per_chip": round(B * 80.0 / ms, 2),
        "vs_budget": round(ms / 80.0, 4),
    }


def sweep():
    results = []
    combos = ([(B, kv, 3000, "int8", "f32") for B in (1, 2, 4, 8, 16)
               for kv in ("model", "int8")]
              + [(1, "model", 3000, "int4", "f32"),
                 (8, "int8", 3000, "int4", "f32"),
                 (16, "int8", 2000, "int4", "f32"),
                 (32, "int8", 750, "int4", "f32"),
                 (32, "int8", 750, "int8", "f32"),
                 # round-3 headline points (int4 KV + bf16 codec)
                 (1, "model", 3000, "int4", "bf16"),
                 (16, "int4", 3000, "int8", "bf16"),
                 (48, "int4", 1000, "int8", "bf16"),
                 (64, "int4", 750, "int8", "bf16")])
    for B, kv, ctx, wq, md in combos:
        if True:
            cmd = [sys.executable, __file__, str(B), kv, str(ctx), wq, md]
            import os
            env = dict(os.environ)
            # keep any plugin paths (e.g. the axon TPU plugin's sitecustomize)
            env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
            try:
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=1800, cwd="/root/repo", env=env)
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("{")]
                if line:
                    r = json.loads(line[-1])
                    results.append(r)
                    print(json.dumps(r), flush=True)
                else:
                    err = (out.stderr or "").strip().splitlines()
                    print(json.dumps({"batch": B, "kv_cache": kv,
                                      "weights": wq, "context": ctx,
                                      "error": err[-1] if err else "no output"}),
                          flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({"batch": B, "kv_cache": kv,
                                  "weights": wq, "context": ctx,
                                  "error": "timeout"}), flush=True)
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        kv = sys.argv[2] if len(sys.argv) > 2 else "int8"
        ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 3000
        wq = sys.argv[4] if len(sys.argv) > 4 else "int8"
        mimi_dtype = sys.argv[5] if len(sys.argv) > 5 else "f32"
        print(json.dumps(run_combo(B, kv, ctx, wq, mimi_dtype=mimi_dtype)))
