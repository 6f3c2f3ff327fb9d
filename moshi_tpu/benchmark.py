"""Real-time-paced benchmark harness with per-step JSON event logging.

Behavioral reference: `rust/moshi-backend/src/benchmark.rs:57-139` — feeds
zero frames paced at the 80 ms frame interval and records timestamped
per-step events to a JSON file (StepStart / StepPostSampling equivalents),
plus a `--mimi-only` mode.

Usage:
  python -m moshi_tpu.benchmark --model moshi_2b --steps 100 --out events.json
  python -m moshi_tpu.benchmark --mimi-only
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_paced(lm_name: str, steps: int, out_path: str | None,
                paced: bool = True) -> dict:
    from bench import build_lm, build_mimi  # repo-root bench helpers
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig

    lm, lm_params = build_lm(lm_name)
    c = lm.config
    n_in = c.num_codebooks - c.dep_q - 1
    mimi, mimi_params = build_mimi(max(c.dep_q, n_in))
    gen = LMGen(lm, LMGenConfig())

    fs = mimi.frame_size
    frame_interval = fs / mimi.sample_rate  # 0.080 s

    enc = jax.jit(mimi.encode_step)
    dec = jax.jit(mimi.decode_step)
    step = jax.jit(gen.step)

    enc_state = mimi.init_encode_state(1)
    dec_state = mimi.init_decode_state(1)
    gen_state = gen.init_state(1, jax.random.PRNGKey(0))
    pcm = jnp.zeros((1, 1, fs), jnp.float32)

    events = []
    t_start = time.perf_counter()
    for i in range(steps + 5):
        if paced:
            target = t_start + i * frame_interval
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
        e = {"event": "step_start", "step": i, "ts": time.perf_counter() - t_start}
        codes, enc_state = enc(mimi_params, enc_state, pcm)
        codes = codes[:, :n_in]
        e["post_encode"] = time.perf_counter() - t_start
        out, gen_state = step(lm_params, gen_state, codes)
        jax.block_until_ready(out)
        e["post_sampling"] = time.perf_counter() - t_start
        audio = jnp.clip(out[:, 1:1 + mimi.num_codebooks], 0, None)
        pcm_out, dec_state = dec(mimi_params, dec_state, audio)
        jax.block_until_ready(pcm_out)
        e["post_decode"] = time.perf_counter() - t_start
        if i >= 5:  # skip warmup
            events.append(e)

    durations = [e["post_decode"] - e["ts"] for e in events]
    durations.sort()
    summary = {
        "model": lm_name,
        "steps": len(events),
        "frame_interval_ms": frame_interval * 1000,
        "p50_ms": durations[len(durations) // 2] * 1000,
        "p90_ms": durations[int(len(durations) * 0.9)] * 1000,
        "max_ms": durations[-1] * 1000,
        "realtime": durations[int(len(durations) * 0.9)] < frame_interval,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "events": events}, f)
    return summary


def bench_mimi_only(steps: int = 100) -> dict:
    from bench import build_mimi
    mimi, mimi_params = build_mimi(8)
    fs = mimi.frame_size
    enc = jax.jit(mimi.encode_step)
    dec = jax.jit(mimi.decode_step)
    enc_state = mimi.init_encode_state(1)
    dec_state = mimi.init_decode_state(1)
    pcm = jnp.zeros((1, 1, fs), jnp.float32)
    # warmup
    for _ in range(5):
        codes, enc_state = enc(mimi_params, enc_state, pcm)
        out, dec_state = dec(mimi_params, dec_state, codes)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        codes, enc_state = enc(mimi_params, enc_state, pcm)
        out, dec_state = dec(mimi_params, dec_state, codes)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per_step = dt / steps
    rtf = (fs / mimi.sample_rate) / per_step
    return {"mimi_steps_per_s": steps / dt, "ms_per_step": per_step * 1000,
            "rtf": rtf}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="moshi_2b")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--out", default=None, help="JSON event log path")
    parser.add_argument("--no-pacing", action="store_true")
    parser.add_argument("--mimi-only", action="store_true")
    args = parser.parse_args()
    if args.mimi_only:
        print(json.dumps(bench_mimi_only(args.steps)))
    else:
        print(json.dumps(bench_paced(args.model, args.steps, args.out,
                                     paced=not args.no_pacing)))


if __name__ == "__main__":
    main()
