"""Batched-TTS frame-time breakdown (follow-up to BENCH_TTS_ASR.md).

The committed capacity table shows the tts_v0_1 batched frame nearly flat
from B=8 to B=12 (67.9 -> 69.1 ms device) — latency-bound, not
throughput-bound.  This ablates WHERE that latency lives, with the same
methodology as scripts/bench_b1_breakdown.py (jitted state-chained loops,
one final device->host sync; per-op microbenches through the tunnel are
unreliable, CLAUDE.md).  Parts:

  full    main_step -> depth_step -> mimi decode  (= bench_tts_batched's
          device-only chain, serve/batched_tts.py step_batch)
  main    temporal forward + text sampling (gen.main_step)
  depth   the dep_q (=16) sequential depformer inner steps + cache commit
          (gen.depth_step with a fixed text token and hidden state)
  dec     mimi decode_step alone
  main_ctx8   main_step with context=8 — isolates ring attention:
          attention cost = main - main_ctx8

Each part runs in its own subprocess so HBM is returned between runs.

Usage:  python scripts/bench_tts_breakdown.py sweep [B] [kv] [ctx] [mimi]
        python scripts/bench_tts_breakdown.py depth --batch 12
Defaults match the committed capacity row: B=12, int8 weights, int8 KV,
ctx 1000, f32 mimi.  Scripts default to CPU on this host; pass --tpu to
run on the real chip (a bare run would steal the tunneled device).
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time


def _build(batch: int, kv: str, ctx: int, mimi_dtype: str, weights: str):
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
    from moshi_tpu.models.loaders import lm_config_tts_v0_1
    from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
    from moshi_tpu.utils.quantize import quantize_lm_params
    from moshi_tpu.utils.serving import override_lm

    lm = override_lm(LMModel(lm_config_tts_v0_1()),
                     kv if kv != "model" else None, ctx or None)
    cfg = lm.config

    def make(k):
        p = lm.init_params(k, jnp.bfloat16)
        if weights != "bf16":
            p = quantize_lm_params(p, mode=weights)
        return p

    shapes = jax.eval_shape(make, jax.random.PRNGKey(0))
    lm_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    md = jnp.bfloat16 if mimi_dtype == "bf16" else jnp.float32
    mimi = MimiModel(mimi_v0_1_config(num_codebooks=cfg.dep_q))
    mshapes = jax.eval_shape(lambda k: mimi.init_params(k, md),
                             jax.random.PRNGKey(0))
    mimi_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), mshapes)
    # same LMGen config as serve/batched_tts.BatchedTTSState (temp 0.6,
    # cfg_coef 1.0 -> no CFG doubling)
    gen = LMGen(lm, LMGenConfig(use_sampling=True, temp=0.6, temp_text=0.6))
    return lm, lm_params, mimi, mimi_params, gen, md


def run_part(part: str, batch: int, kv: str, ctx: int, mimi_dtype: str,
             weights: str, steps: int = 60, warmup: int = 8) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    use_ctx = 8 if part.endswith("_ctx8") else ctx
    part = part.removesuffix("_ctx8")
    lm, lm_params, mimi, mimi_params, gen, md = _build(
        batch, kv, use_ctx, mimi_dtype, weights)
    c = lm.config
    B = batch
    n_q = c.dep_q
    missing = c.num_codebooks - c.dep_q - 1
    input_tokens = jnp.full((B, max(missing, 1), 1), -1, jnp.int32)  # ZERO
    gstate = gen.init_state(B, jax.random.PRNGKey(0))
    dec_state = mimi.init_decode_state(B, md)
    fixed_tok = jnp.zeros((B,), jnp.int32)
    zero_mask = jnp.zeros((B, n_q), bool)
    ones = jnp.ones((B,), bool)
    # hidden-state placeholder for depth-only runs, at main_step's h shape
    h0 = jnp.zeros((B, 1, c.dim), jnp.bfloat16)

    if part == "full":
        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def frame(lm_params, mimi_params, gstate, dec_state):
            tok, _, h, gstate = gen.main_step(lm_params, gstate,
                                              input_tokens, ones, None)
            out, gstate = gen.depth_step(lm_params, gstate, tok, h, ones,
                                         None, zero_mask, None)
            codes = jnp.clip(out[:, 1:n_q + 1], 0, None)
            pcm, dec_state = mimi.decode_step(mimi_params, dec_state, codes,
                                              exec_mask=ones)
            return gstate, dec_state

        state = (gstate, dec_state)
        step = lambda s: frame(lm_params, mimi_params, *s)  # noqa: E731
        fetch = lambda s: s[0]["offsets"]  # noqa: E731
    elif part == "main":
        @functools.partial(jax.jit, donate_argnums=(1,))
        def frame(lm_params, gstate):
            tok, _, h, gstate = gen.main_step(lm_params, gstate,
                                              input_tokens, ones, None)
            return gstate, tok

        state = gstate
        step = lambda s: frame(lm_params, s)[0]  # noqa: E731
        fetch = lambda s: s["offsets"]  # noqa: E731
    elif part == "depth":
        @functools.partial(jax.jit, donate_argnums=(1,))
        def frame(lm_params, gstate):
            out, gstate = gen.depth_step(lm_params, gstate, fixed_tok, h0,
                                         ones, None, zero_mask, None)
            return gstate, out

        state = gstate
        step = lambda s: frame(lm_params, s)[0]  # noqa: E731
        fetch = lambda s: s["offsets"]  # noqa: E731
    elif part == "dec":
        audio = jnp.zeros((B, n_q, 1), jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def frame(mimi_params, dec_state):
            pcm, dec_state = mimi.decode_step(mimi_params, dec_state, audio,
                                              exec_mask=ones)
            return dec_state

        state = dec_state
        step = lambda s: frame(mimi_params, s)  # noqa: E731
        fetch = lambda s: jax.tree.leaves(s)[0]  # noqa: E731
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
    return {"part": part if use_ctx == ctx else part + "_ctx8",
            "batch": batch, "kv": kv, "ctx": use_ctx, "mimi": mimi_dtype,
            "weights": weights, "ms_per_frame": round(ms, 3)}


def sweep(batch: int, kv: str, ctx: int, mimi_dtype: str, weights: str,
          tpu: bool, steps: int = 60):
    results = {}
    for part in ("full", "main", "main_ctx8", "depth", "dec"):
        cmd = [sys.executable, __file__, part, "--batch", str(batch),
               "--kv", kv, "--ctx", str(ctx), "--mimi", mimi_dtype,
               "--weights", weights, "--steps", str(steps)] \
            + (["--tpu"] if tpu else [])
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
    if {"full", "main", "main_ctx8", "depth", "dec"} <= results.keys():
        print(json.dumps({"derived_ms": {
            "attention (main - main_ctx8)":
                round(results["main"] - results["main_ctx8"], 3),
            "fusion win (main + depth + dec - full)":
                round(results["main"] + results["depth"] + results["dec"]
                      - results["full"], 3),
        }}), flush=True)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("part", nargs="?", default="sweep")
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--kv", default="int8",
                        choices=["model", "int8", "int4"])
    parser.add_argument("--ctx", type=int, default=1000)
    parser.add_argument("--mimi", default="f32", choices=["f32", "bf16"])
    parser.add_argument("--weights", default="int8",
                        choices=["bf16", "int8", "int4"])
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--tpu", action="store_true",
                        help="run on the real chip (default: CPU — a bare "
                             "run would steal the tunneled device)")
    args = parser.parse_args()
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.part == "sweep":
        sweep(args.batch, args.kv, args.ctx, args.mimi, args.weights,
              args.tpu, args.steps)
    else:
        print(json.dumps(run_part(args.part, args.batch, args.kv, args.ctx,
                                  args.mimi, args.weights, args.steps)))
