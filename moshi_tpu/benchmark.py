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

    enc = jax.jit(mimi.encode_step, donate_argnums=1)
    dec = jax.jit(mimi.decode_step, donate_argnums=1)
    step = jax.jit(gen.step, donate_argnums=1)

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


def _zeros_like_tree(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _preset_lm(name: str, dtype=jnp.bfloat16):
    from moshi_tpu.models.loaders import LM_PRESETS
    from moshi_tpu.models.lm import LMModel
    config = LM_PRESETS[name]()
    model = LMModel(config)
    shapes = jax.eval_shape(lambda k: model.init_params(k, dtype),
                            jax.random.PRNGKey(0))
    return model, _zeros_like_tree(shapes)


def bench_asr(model_name: str = "asr_300m_202501", batch: int = 8,
              steps: int = 50, out_path: str | None = None) -> dict:
    """Batched streaming-ASR step benchmark: mimi encode + host-side delayed
    feeding + LM step + word state machine — the real `step_pcm` round-trip
    that `serve/batched_asr.py` pays per 80 ms frame (reference metric:
    `asr_model_step_duration` buckets 20-80 ms, metrics.rs:21-25)."""
    from bench import build_mimi
    from moshi_tpu.models.asr import StreamingASR

    lm, lm_params = _preset_lm(model_name)
    mimi, mimi_params = build_mimi(min(lm.config.n_q, 32))
    asr = StreamingASR(mimi, lm, batch, asr_delay_in_tokens=6,
                       temperature=0.0)
    state = asr.init_state(jax.random.PRNGKey(0))
    fs = mimi.frame_size
    rs = np.random.RandomState(0)

    events = []
    for i in range(steps + 5):
        pcm = (rs.randn(batch, 1, fs) * 0.05).astype(np.float32)
        t0 = time.perf_counter()
        msgs, state = asr.step_pcm(mimi_params, lm_params, state, pcm,
                                   exec_mask=np.ones((batch,), bool))
        dt = time.perf_counter() - t0
        if i >= 5:
            events.append({"event": "asr_step", "step": i, "ms": dt * 1000,
                           "n_msgs": len(msgs)})
    # device-only share: the same jitted pieces chained with constant host
    # inputs, one final sync.  The difference vs the full step is the host
    # state-machine round trip, which through THIS dev environment's
    # tunneled TPU costs ~30 ms/sync (CLAUDE.md) — a local chip pays <1 ms.
    tokens = jnp.zeros((batch, 1 + asr.n_codebooks, 1), jnp.int32)
    pcm_j = jnp.zeros((batch, 1, fs), jnp.float32)
    tr_state, rng = state["transformer"], state["rng"]
    mimi_state = state["mimi"]
    for _ in range(3):
        codes, mimi_state = asr._encode_fn(mimi_params, mimi_state, pcm_j, None)
        _, _, tr_state, rng = asr._step_fn(lm_params, tr_state, tokens, rng, None)
    jax.block_until_ready(tr_state["offset"])
    t0 = time.perf_counter()
    for _ in range(len(events)):
        codes, mimi_state = asr._encode_fn(mimi_params, mimi_state, pcm_j, None)
        tok, _, tr_state, rng = asr._step_fn(lm_params, tr_state, tokens, rng, None)
    np.asarray(tok)
    device_ms = (time.perf_counter() - t0) * 1000 / len(events)

    durations = sorted(e["ms"] for e in events)
    summary = {
        "mode": "asr", "model": model_name, "batch": batch,
        "steps": len(events),
        "p50_ms": durations[len(durations) // 2],
        "p90_ms": durations[int(len(durations) * 0.9)],
        "ms_per_user_p50": durations[len(durations) // 2] / batch,
        "device_only_ms": round(device_ms, 2),
        "host_roundtrip_ms": round(durations[len(durations) // 2] - device_ms, 2),
        "realtime": durations[int(len(durations) * 0.9)] < 80.0,
        "realtime_device_only": device_ms < 80.0,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "events": events}, f)
    return summary


def bench_tts(model_name: str = "tts_v0_1", steps: int = 50,
              out_path: str | None = None) -> dict:
    """Streaming-TTS frame benchmark: the full host loop of
    `serve/tts_ws.TTSStreamer.step` — temporal step -> host text state
    machine -> depformer -> mimi decode, with the device<->host round trip
    the DSM text machine requires each frame (reference: tts.py:602-619)."""
    from bench import build_mimi
    from moshi_tpu.models.tts import TTSModel, StateMachine, TokenIds
    from moshi_tpu.serve.tts_ws import TTSStreamer

    lm, lm_params = _preset_lm(model_name)
    c = lm.config
    mimi, mimi_params = build_mimi(min(c.dep_q, 32))

    class _Tok:
        def encode(self, word):
            return [7 + (len(word) % 13)]

    machine = StateMachine(TokenIds(card=c.text_card + 1), max_padding=8,
                           initial_padding=2)
    tts = TTSModel(lm, mimi, _Tok(), machine, delay_steps=25, temp=0.6,
                   n_q=c.dep_q, max_gen_length=10_000, final_padding=4)
    streamer = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(0))

    events = []
    for i in range(steps + 5):
        # keep the word queue fed so the machine never starves
        if len(streamer.state.entries) < 4:
            streamer.feed_words(["hello world how are you"])
        t0 = time.perf_counter()
        pcm, _ = streamer.step()
        dt = time.perf_counter() - t0
        if i >= 5:
            events.append({"event": "tts_step", "step": i, "ms": dt * 1000,
                           "audio": pcm is not None})
    # device-only share (see bench_asr): chain main_step + depth_decode with
    # a fixed text token, one final sync — the DSM machine's host round trip
    # costs ~30 ms/sync through this dev tunnel, <1 ms on a local chip.
    gstate = streamer.gstate
    dec_state = streamer.dec_state
    fixed_tok = jnp.zeros((1,), jnp.int32)
    zero_mask = jnp.zeros((1, c.dep_q), bool)
    valid = jnp.ones((1,), bool)
    for _ in range(3):
        _, _, h, gstate = streamer._main(lm_params, gstate, streamer._input,
                                         None, streamer.condition_sum)
        _, pcm, gstate, dec_state = streamer._depth_decode(
            lm_params, mimi_params, gstate, dec_state, fixed_tok, h, None,
            zero_mask, valid)
    jax.block_until_ready(pcm)
    t0 = time.perf_counter()
    for _ in range(len(events)):
        _, _, h, gstate = streamer._main(lm_params, gstate, streamer._input,
                                         None, streamer.condition_sum)
        _, pcm, gstate, dec_state = streamer._depth_decode(
            lm_params, mimi_params, gstate, dec_state, fixed_tok, h, None,
            zero_mask, valid)
    np.asarray(pcm)
    device_ms = (time.perf_counter() - t0) * 1000 / len(events)

    durations = sorted(e["ms"] for e in events)
    summary = {
        "mode": "tts", "model": model_name, "steps": len(events),
        "p50_ms": durations[len(durations) // 2],
        "p90_ms": durations[int(len(durations) * 0.9)],
        "frames_per_s": 1000.0 / max(durations[len(durations) // 2], 1e-9),
        "device_only_ms": round(device_ms, 2),
        "host_roundtrip_ms": round(durations[len(durations) // 2] - device_ms, 2),
        "realtime": durations[int(len(durations) * 0.9)] < 80.0,
        "realtime_device_only": device_ms < 80.0,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "events": events}, f)
    return summary


def bench_mimi_only(steps: int = 100) -> dict:
    from bench import build_mimi
    mimi, mimi_params = build_mimi(8)
    fs = mimi.frame_size
    enc = jax.jit(mimi.encode_step, donate_argnums=1)
    dec = jax.jit(mimi.decode_step, donate_argnums=1)
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
    parser.add_argument("--mode", default="duplex",
                        choices=("duplex", "tts", "asr"))
    parser.add_argument("--batch", type=int, default=8, help="asr batch size")
    args = parser.parse_args()
    if args.mimi_only:
        print(json.dumps(bench_mimi_only(args.steps)))
    elif args.mode == "asr":
        name = args.model if args.model != "moshi_2b" else "asr_300m_202501"
        print(json.dumps(bench_asr(name, args.batch, args.steps, args.out)))
    elif args.mode == "tts":
        name = args.model if args.model != "moshi_2b" else "tts_v0_1"
        print(json.dumps(bench_tts(name, args.steps, args.out)))
    else:
        print(json.dumps(bench_paced(args.model, args.steps, args.out,
                                     paced=not args.no_pacing)))


if __name__ == "__main__":
    main()
