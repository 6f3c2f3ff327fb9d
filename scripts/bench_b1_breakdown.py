"""B=1 flagship frame-time breakdown (VERDICT r3 ask #1).

Ablates the flagship full-duplex frame (moshi_7b q4 weights + bf16 codec,
B=1, ctx 3000) into its components, each measured the only trustworthy way on
the tunneled chip (CLAUDE.md): a jitted state-chained loop with ONE final
device->host sync.  Components:

  full        mimi encode -> LM step -> mimi decode   (bench.py flagship)
  lm          LM step only (gen.step: temporal + sampling + depformer + cache)
  main        LM step with the depformer replaced by constant tokens
              (depformer_replace_tokens) -> depformer cost = lm - main
  notext      temporal transformer forward only (no sampling, no cache commit)
  mimi        encode + decode only
  enc / dec   each codec half alone

Each combo runs in its own subprocess so HBM is returned between runs.

Usage:  python scripts/bench_b1_breakdown.py sweep          # table
        python scripts/bench_b1_breakdown.py full int4 bf16 # one combo
"""

import functools
import json
import subprocess
import sys
import time


def _build(weights: str, mimi_dtype: str, context: int | None = None):
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
    from moshi_tpu.models.loaders import lm_config_v0_1
    from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
    from moshi_tpu.utils.quantize import quantize_lm_params

    config = lm_config_v0_1()
    if context is not None:
        from dataclasses import replace
        config = replace(config, context=context)
    lm = LMModel(config)
    if weights == "bf16":
        shapes = jax.eval_shape(lambda k: lm.init_params(k, jnp.bfloat16),
                                jax.random.PRNGKey(0))
    else:
        shapes = jax.eval_shape(
            lambda k: quantize_lm_params(lm.init_params(k, jnp.bfloat16),
                                         mode=weights),
            jax.random.PRNGKey(0))
    lm_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    md = jnp.bfloat16 if mimi_dtype == "bf16" else jnp.float32
    mimi = MimiModel(mimi_v0_1_config(num_codebooks=config.dep_q))
    mshapes = jax.eval_shape(lambda k: mimi.init_params(k, md),
                             jax.random.PRNGKey(0))
    mimi_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), mshapes)
    gen = LMGen(lm, LMGenConfig(use_sampling=True))
    return lm, lm_params, mimi, mimi_params, gen, md


def run_part(part: str, weights: str = "int4", mimi_dtype: str = "bf16",
             steps: int = 100, warmup: int = 10) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if part == "gemv":
        return run_gemv(weights, steps, warmup)
    context = 8 if part.endswith("_ctx8") else None
    part = part.removesuffix("_ctx8")
    lm, lm_params, mimi, mimi_params, gen, md = _build(weights, mimi_dtype,
                                                       context)
    config = lm.config
    B = 1
    n_in = config.num_codebooks - config.dep_q - 1
    fs = mimi.frame_size

    lm_state = gen.init_state(B, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    enc_state = mimi.init_encode_state(B, md)
    dec_state = mimi.init_decode_state(B, md)
    replace = jnp.zeros((B, config.dep_q, 1), jnp.int32)

    if part == "full":
        @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
        def frame(lm_params, mimi_params, lm_state, enc_state, dec_state, pcm):
            codes, enc_state = mimi.encode_step(mimi_params, enc_state, pcm)
            kin = codes[:, :n_in]
            out, lm_state = gen.step(lm_params, lm_state, kin)
            audio = jnp.clip(out[:, 1:1 + mimi.num_codebooks], 0, None)
            pcm_out, dec_state = mimi.decode_step(mimi_params, dec_state, audio)
            return lm_state, enc_state, dec_state, pcm_out

        pcm = jnp.zeros((B, 1, fs), md)
        args = lambda s: (lm_params, mimi_params, s[0], s[1], s[2], pcm)  # noqa: E731
        state = (lm_state, enc_state, dec_state)
        step = lambda s: frame(*args(s))[:3]  # noqa: E731
        fetch = lambda s: s[0]["offsets"]  # noqa: E731
    elif part in ("lm", "main"):
        rep = replace if part == "main" else None

        @functools.partial(jax.jit, donate_argnums=(1,))
        def frame(lm_params, lm_state, tokens):
            out, lm_state = gen.step(lm_params, lm_state, tokens,
                                     depformer_replace_tokens=rep)
            return lm_state, out

        tokens = jnp.zeros((B, n_in, 1), jnp.int32)
        state = lm_state
        step = lambda s: frame(lm_params, s, tokens)[0]  # noqa: E731
        fetch = lambda s: s["offsets"]  # noqa: E731
    elif part == "notext":
        @functools.partial(jax.jit, donate_argnums=(1,))
        def frame(lm_params, tr_state, tokens):
            h, text_logits, tr_state = lm.forward_text_step(
                lm_params, tr_state, tokens)
            return tr_state, text_logits

        tokens = jnp.zeros((B, config.num_codebooks, 1), jnp.int32)
        state = lm_state["transformer"]
        step = lambda s: frame(lm_params, s, tokens)[0]  # noqa: E731
        fetch = lambda s: s["offset"] if "offset" in s else jax.tree.leaves(s)[0]  # noqa: E731
    elif part in ("mimi", "enc", "dec"):
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def frame(mimi_params, enc_state, dec_state, pcm, audio):
            codes = None
            if part in ("mimi", "enc"):
                codes, enc_state = mimi.encode_step(mimi_params, enc_state, pcm)
            if part in ("mimi", "dec"):
                use = codes[:, :mimi.num_codebooks] if part == "mimi" else audio
                use = jnp.clip(use, 0, None)
                pcm_out, dec_state = mimi.decode_step(mimi_params, dec_state, use)
            return enc_state, dec_state

        pcm = jnp.zeros((B, 1, fs), md)
        audio = jnp.zeros((B, mimi.num_codebooks, 1), jnp.int32)
        state = (enc_state, dec_state)
        step = lambda s: frame(mimi_params, s[0], s[1], pcm, audio)  # noqa: E731
        fetch = lambda s: jax.tree.leaves(s[0 if part != "dec" else 1])[0]  # noqa: E731
    else:
        raise ValueError(part)

    for _ in range(warmup):
        state = step(state)
    np.asarray(jax.tree.leaves(fetch(state))[0])

    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    np.asarray(jax.tree.leaves(fetch(state))[0])
    ms = (time.perf_counter() - t0) * 1000.0 / steps
    return {"part": part, "weights": weights, "mimi": mimi_dtype,
            "ms_per_frame": round(ms, 3)}


def run_gemv(weights: str = "int4", steps: int = 100, warmup: int = 10,
             B: int = 1) -> dict:
    """Pure chained weight-read probe at exact 7B per-layer shapes: 32 x
    (qkvo + gating linear_in/out) + text_linear, x fed forward so every
    gemv depends on the previous one; one final sync.  Reports the
    achieved HBM bandwidth over the packed weight bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moshi_tpu.utils.matmul import wdot
    from moshi_tpu.utils.quantize import quantize_tensor, quantize_tensor4

    d, ff_h, tc = 4096, 11264, 32768
    L = 32

    def q(shape):
        w = jnp.zeros(shape, jnp.bfloat16)
        if weights == "int4":
            s = jax.eval_shape(quantize_tensor4, w)
        elif weights == "int8":
            s = jax.eval_shape(quantize_tensor, w)
        else:
            return w
        return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), s)

    params = {"layers": [{"qkvo": q((d, 4 * d)),
                          "lin_in": q((d, 2 * ff_h)),
                          "lin_out": q((ff_h, d))} for _ in range(L)],
              "text": q((d, tc))}
    nbytes_bf16 = 2 * (L * (d * 4 * d + d * 2 * ff_h + ff_h * d) + d * tc)
    nbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                 for x in jax.tree.leaves(params))

    @jax.jit
    def pass_(params, x):
        for pl_ in params["layers"]:
            q = wdot(x, pl_["qkvo"])
            x = q[:, :d] * 0.999 + x * 1e-3
            u = wdot(x, pl_["lin_in"])
            u = u[:, :ff_h] * jax.nn.sigmoid(u[:, ff_h:])
            x = wdot(u, pl_["lin_out"]) * 0.03 + x
        t = wdot(x, params["text"])
        return x + t[:, :d] * 1e-4

    x = jnp.ones((B, d), jnp.bfloat16)
    for _ in range(warmup):
        x = pass_(params, x)
    np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(steps):
        x = pass_(params, x)
    np.asarray(x)
    ms = (time.perf_counter() - t0) * 1000.0 / steps
    return {"part": "gemv", "weights": weights,
            "ms_per_frame": round(ms, 3),
            "weight_gb": round(nbytes / 1e9, 2),
            "gbps": round(nbytes / ms / 1e6, 1),
            "bf16_equiv_gb": round(nbytes_bf16 / 1e9, 2)}


def sweep(weights="int4", mimi_dtype="bf16"):
    import os
    results = {}
    for part in ("full", "lm", "main", "notext", "mimi", "enc", "dec"):
        cmd = [sys.executable, __file__, part, weights, mimi_dtype]
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=1800, cwd="/root/repo", env=env)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if line:
            r = json.loads(line[-1])
            results[part] = r["ms_per_frame"]
            print(json.dumps(r), flush=True)
        else:
            err = (out.stderr or "").strip().splitlines()
            print(json.dumps({"part": part,
                              "error": err[-1] if err else "no output"}),
                  flush=True)
    if {"full", "lm", "main", "notext", "mimi"} <= results.keys():
        derived = {
            "depformer (lm - main)": round(results["lm"] - results["main"], 3),
            "sampling+cache (main - notext)":
                round(results["main"] - results["notext"], 3),
            "codec separate (mimi)": results["mimi"],
            "fusion win (lm + mimi - full)":
                round(results["lm"] + results["mimi"] - results["full"], 3),
        }
        print(json.dumps({"derived_ms": derived}), flush=True)
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep(*(sys.argv[2:4] or ()))
    else:
        part = sys.argv[1] if len(sys.argv) > 1 else "full"
        weights = sys.argv[2] if len(sys.argv) > 2 else "int4"
        md = sys.argv[3] if len(sys.argv) > 3 else "bf16"
        print(json.dumps(run_part(part, weights, md)))
