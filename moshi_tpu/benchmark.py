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


def _preset_lm(name: str, dtype=jnp.bfloat16, quantize: str | None = None):
    from moshi_tpu.models.loaders import LM_PRESETS
    from moshi_tpu.models.lm import LMModel
    config = LM_PRESETS[name]()
    model = LMModel(config)

    def make(k):
        p = model.init_params(k, dtype)
        if quantize:
            # quantize inside eval_shape so the bf16 tree is never
            # materialized (tts_v0_1 is ~3.3B params = 7 GB bf16; building
            # bf16 zeros then quantizing would double the HBM peak)
            from moshi_tpu.utils.quantize import quantize_lm_params
            p = quantize_lm_params(p, mode=quantize)
        return p

    shapes = jax.eval_shape(make, jax.random.PRNGKey(0))
    return model, _zeros_like_tree(shapes)


def bench_asr(model_name: str = "asr_300m_202501", batch: int = 8,
              steps: int = 50, out_path: str | None = None,
              kv_cache: str | None = None,
              context: int | None = None,
              weights: str | None = None,
              mimi_dtype=jnp.float32,
              mimi_chunks: int = 1) -> dict:
    """Batched streaming-ASR step benchmark: mimi encode + host-side delayed
    feeding + LM step + word state machine — the real `step_pcm` round-trip
    that `serve/batched_asr.py` pays per 80 ms frame (reference metric:
    `asr_model_step_duration` buckets 20-80 ms, metrics.rs:21-25).
    Capacity knobs mirror bench_tts_batched: bf16 KV OOMs between B=128 and
    B=256 on a 16 GB v5e (BENCH_TTS_ASR.md) — int8 KV halves the per-user
    cache and is the production config past B=128."""
    from bench import build_mimi
    from moshi_tpu.models.asr import StreamingASR

    lm, lm_params = _preset_lm(model_name, quantize=weights)
    from moshi_tpu.utils.serving import override_lm
    lm = override_lm(lm, kv_cache, context)
    mimi, mimi_params = build_mimi(min(lm.config.n_q, 32), mimi_dtype)
    asr = StreamingASR(mimi, lm, batch, asr_delay_in_tokens=6,
                       temperature=0.0, mimi_dtype=mimi_dtype,
                       mimi_chunks=mimi_chunks)
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
    tr_state, rng = state["transformer"], state["rng"]
    mimi_state = state["mimi"]
    bc = asr._mimi_bc
    pcm_j = jnp.zeros((bc, 1, fs), mimi_dtype)

    def encode(ms):
        if asr.mimi_chunks == 1:
            return asr._encode_fn(mimi_params, ms, pcm_j, None)[1]
        return tuple(asr._encode_fn(mimi_params, ch, pcm_j, None)[1]
                     for ch in ms)

    for _ in range(3):
        mimi_state = encode(mimi_state)
        _, _, tr_state, rng = asr._step_fn(lm_params, tr_state, tokens, rng, None)
    jax.block_until_ready(tr_state["offset"])
    t0 = time.perf_counter()
    for _ in range(len(events)):
        mimi_state = encode(mimi_state)
        tok, _, tr_state, rng = asr._step_fn(lm_params, tr_state, tokens, rng, None)
    np.asarray(tok)
    device_ms = (time.perf_counter() - t0) * 1000 / len(events)

    durations = sorted(e["ms"] for e in events)
    summary = {
        "mode": "asr", "model": model_name, "batch": batch,
        "mimi_chunks": mimi_chunks,
        "kv_cache": kv_cache or lm.config.kv_cache_dtype,
        "context": lm.config.context,
        "weights": weights or "bf16",
        "mimi": jnp.dtype(mimi_dtype).name,
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


def bench_asr_host_only(model_name: str = "asr_300m_202501",
                        batch: int = 64, steps: int = 200) -> dict:
    """Pure-python cost of the ASR host control plane at batch — the
    per-slot delayed-feeding + word-tracking loops in
    `models/asr.py:step_tokens` with the device step stubbed out.  This is
    the number the tunnel-dominated `host_roundtrip_ms` cannot show
    (VERDICT r3 item 2): what the host actually burns per frame at scale."""
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.models.mimi import MimiModel, MimiConfig
    from moshi_tpu.models.loaders import LM_PRESETS
    from moshi_tpu.models.lm import LMModel

    config = LM_PRESETS[model_name]()
    lm = LMModel(config)
    mimi = MimiModel(MimiConfig(num_codebooks=min(config.n_q, 32)))

    class WordyTok:
        def decode(self, ids):
            return "w" * len(ids)

    asr = StreamingASR(mimi, lm, batch, asr_delay_in_tokens=6,
                       temperature=0.0, text_tokenizer=WordyTok())
    rs = np.random.RandomState(0)
    # plausible text stream: ~40% pads/epads so words flush at a realistic
    # rate (2-3 words/s), rest real tokens
    text_seq = np.where(rs.rand(steps + 5, batch) < 0.25, 0,
                        np.where(rs.rand(steps + 5, batch) < 0.2, 3,
                                 rs.randint(4, 1000, (steps + 5, batch))))
    text_seq = text_seq.astype(np.int32)
    prs = np.zeros((2, batch), np.float32)
    counter = {"i": 0}

    def fake_step(lm_params, tr_state, tokens, rng, exec_mask):
        i = counter["i"]
        counter["i"] += 1
        return text_seq[min(i, steps + 4)], prs, tr_state, rng

    asr._step_fn = fake_step
    state = {"transformer": {}, "rng": None, "mimi": {}}
    audio = rs.randint(0, 2048, (batch, asr.n_codebooks, 1)).astype(np.int32)

    for i in range(5):  # warm the interpreter/caches
        asr.step_tokens(None, state, audio)
    t0 = time.perf_counter()
    n_msgs = 0
    for i in range(steps):
        msgs, _ = asr.step_tokens(None, state, audio)
        n_msgs += len(msgs)
    host_ms = (time.perf_counter() - t0) * 1000 / steps
    return {"mode": "asr_host_only", "model": model_name, "batch": batch,
            "steps": steps, "host_python_ms": round(host_ms, 3),
            "host_python_us_per_user": round(host_ms * 1000 / batch, 1),
            "msgs_per_step": n_msgs / steps}


def bench_tts_batched(model_name: str = "tts_v0_1", batch: int = 8,
                      steps: int = 50, out_path: str | None = None,
                      kv_cache: str | None = None,
                      context: int | None = None,
                      weights: str | None = None,
                      mimi_dtype=jnp.float32) -> dict:
    """Batched-TTS frame benchmark: `serve/batched_tts.BatchedTTSState.
    step_batch` with all slots active — the real multi-tenant step (one
    temporal fwd + per-slot DSM machines + depformer + Mimi decode).
    Also isolates the pure-python host share (machines + mask assembly)
    by stubbing the two jitted device calls."""
    from bench import build_mimi
    from moshi_tpu.models.tts import TTSModel, StateMachine, TokenIds
    from moshi_tpu.serve.batched_tts import BatchedTTSState, _TtsSlot

    lm, lm_params = _preset_lm(model_name, quantize=weights)
    # capacity knobs (tts_v0_1's bf16 KV at ctx 4096 alone is ~13 GB at
    # B=8 — int8/int4 KV and a bounded context are the production batched
    # config, exactly as for batched full-duplex, BENCH_BATCH.md)
    from moshi_tpu.utils.serving import override_lm
    lm = override_lm(lm, kv_cache, context)
    c = lm.config
    mimi, mimi_params = build_mimi(min(c.dep_q, 32), mimi_dtype)

    class _Tok:
        def encode(self, word):
            return [7 + (len(word) % 13)]

    machine = StateMachine(TokenIds(card=c.text_card + 1), max_padding=8,
                           initial_padding=2)
    tts = TTSModel(lm, mimi, _Tok(), machine, delay_steps=25, temp=0.6,
                   n_q=c.dep_q, max_gen_length=10_000, final_padding=4)
    state = BatchedTTSState(tts, lm_params, mimi_params, batch,
                            jax.random.PRNGKey(0), mimi_dtype=mimi_dtype)
    for b in range(batch):
        state.slots[b] = _TtsSlot(machine)

    def feed_all():
        for b in range(batch):
            if len(state.slots[b].state.entries) < 4:
                state.feed_words(b, ["hello world how are you today friend"])

    events = []
    active = list(range(batch))
    for i in range(steps + 5):
        feed_all()
        t0 = time.perf_counter()
        state.step_batch(active)
        dt = time.perf_counter() - t0
        if i >= 5:
            events.append({"event": "tts_batch_step", "step": i,
                           "ms": dt * 1000})
        for b in range(batch):  # drain queues so they don't grow
            q = state.slots[b].queue
            while not q.empty():
                q.get_nowait()

    # device-only share: chain the two jitted calls with fixed host inputs
    gstate, dec_state = state.gstate, state.dec_state
    fixed_tok = jnp.zeros((batch,), jnp.int32)
    zero_mask = jnp.zeros((batch, c.dep_q), bool)
    ones = jnp.ones((batch,), bool)
    for _ in range(3):
        _, _, h, gstate = state._main(lm_params, gstate, state._input,
                                      ones, state.condition_sum)
        _, pcm, gstate, dec_state = state._depth_decode(
            lm_params, mimi_params, gstate, dec_state, fixed_tok, h,
            ones, zero_mask, ones)
    jax.block_until_ready(pcm)
    t0 = time.perf_counter()
    for _ in range(len(events)):
        _, _, h, gstate = state._main(lm_params, gstate, state._input,
                                      ones, state.condition_sum)
        _, pcm, gstate, dec_state = state._depth_decode(
            lm_params, mimi_params, gstate, dec_state, fixed_tok, h,
            ones, zero_mask, ones)
    np.asarray(pcm)
    device_ms = (time.perf_counter() - t0) * 1000 / len(events)

    # pure-python host share: stub the device calls on the SAME state
    # object (a second BatchedTTSState would allocate a second full device
    # KV and OOM the big presets at batch)
    state2 = state
    for b in range(batch):
        state2.slots[b] = _TtsSlot(machine)
    toks_np = np.full((batch,), 5, np.int32)
    out_np = np.zeros((batch, 1 + c.dep_q, 1), np.int32)
    pcm_np = np.zeros((batch, 1, mimi.frame_size), np.float32)
    state2._main = lambda *a, **k: (toks_np, None, None, state2.gstate)
    state2._depth_decode = lambda *a, **k: (out_np, pcm_np, state2.gstate,
                                            state2.dec_state)
    for b in range(batch):
        state2.feed_words(b, ["hello world how are you today"] * 10)
    for _ in range(5):
        state2.step_batch(active)
    t0 = time.perf_counter()
    for i in range(len(events)):
        for b in range(batch):
            if len(state2.slots[b].state.entries) < 4:
                state2.feed_words(b, ["hello world how are you"])
        state2.step_batch(active)
        for b in range(batch):
            q = state2.slots[b].queue
            while not q.empty():
                q.get_nowait()
    host_python_ms = (time.perf_counter() - t0) * 1000 / len(events)

    durations = sorted(e["ms"] for e in events)
    summary = {
        "mode": "tts_batched", "model": model_name, "batch": batch,
        "kv_cache": kv_cache or c.kv_cache_dtype,
        "context": c.context,
        "weights": weights or "bf16",
        "mimi": jnp.dtype(mimi_dtype).name,
        "steps": len(events),
        "p50_ms": durations[len(durations) // 2],
        "p90_ms": durations[int(len(durations) * 0.9)],
        "ms_per_user_p50": durations[len(durations) // 2] / batch,
        "device_only_ms": round(device_ms, 2),
        "ms_per_user_device": round(device_ms / batch, 3),
        "host_python_ms": round(host_python_ms, 3),
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
    parser.add_argument("--batch", type=int, default=8,
                        help="asr/tts batch size (tts batch>1 runs the "
                             "batched multi-tenant step)")
    parser.add_argument("--kv-cache", default=None,
                        choices=["int8", "int4"],
                        help="KV cache dtype for batched tts/asr")
    parser.add_argument("--ctx", type=int, default=None,
                        help="context override for batched tts/asr")
    parser.add_argument("--weights", default=None,
                        choices=["int8", "int4"],
                        help="weight quantization for batched tts/asr")
    parser.add_argument("--mimi-dtype", default="f32",
                        choices=["f32", "bf16"],
                        help="codec dtype for batched tts/asr (bf16 halves "
                             "the codec share; codes not bit-exact — "
                             "QUALITY.md bounds)")
    parser.add_argument("--host-only", action="store_true",
                        help="measure only the pure-python host control "
                             "plane (no device): the per-slot state "
                             "machines at batch")
    parser.add_argument("--mimi-chunks", type=int, default=1,
                        help="split the mimi encoder into N sequential "
                             "batch chunks (bounds encoder temps next to "
                             "the LM KV at very large batch — the ASR "
                             "B=512 remat cliff, BENCH_TTS_ASR.md)")
    args = parser.parse_args()
    mimi_dtype = jnp.bfloat16 if args.mimi_dtype == "bf16" else jnp.float32
    if args.mimi_only:
        print(json.dumps(bench_mimi_only(args.steps)))
    elif args.mode == "asr":
        name = args.model if args.model != "moshi_2b" else "asr_300m_202501"
        if args.host_only:
            print(json.dumps(bench_asr_host_only(name, args.batch,
                                                 max(args.steps, 100))))
        else:
            out = bench_asr(name, args.batch, args.steps, args.out,
                            args.kv_cache, args.ctx, args.weights,
                            mimi_dtype, mimi_chunks=args.mimi_chunks)
            out.update(bench_asr_host_only(name, args.batch,
                                           max(args.steps, 100)))
            out["mode"] = "asr"
            print(json.dumps(out))
    elif args.mode == "tts":
        name = args.model if args.model != "moshi_2b" else "tts_v0_1"
        if args.batch > 1:
            print(json.dumps(bench_tts_batched(name, args.batch, args.steps,
                                               args.out, args.kv_cache,
                                               args.ctx, args.weights,
                                               mimi_dtype)))
        else:
            print(json.dumps(bench_tts(name, args.steps, args.out)))
    else:
        print(json.dumps(bench_paced(args.model, args.steps, args.out,
                                     paced=not args.no_pacing)))


if __name__ == "__main__":
    main()
