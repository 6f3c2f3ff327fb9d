"""End-to-end batched serving demo on the real chip: 7B (zeros weights,
int8 w / int8 KV / ctx 3000), B concurrent ws clients streaming real-time
opus audio through the full serve stack (aiohttp ws + ogg-opus + batched
jitted frame loop).  Reports per-step model times and per-client audio
throughput.

Soak mode (VERDICT r2 ask #6): `--seconds 280 --churn` keeps half the
slots streaming past the ctx-3000 ring wraparound (4 min at 12.5 Hz) while
the other half join/leave every ~20 s under live load — validating per-slot
resets, stable step time, and no OOM across the wraparound.
"""
import argparse
import asyncio
import json
import time
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.loaders import lm_config_v0_1
from moshi_tpu.models.mimi import MimiModel, mimi_v0_1_config
from moshi_tpu.utils.quantize import quantize_lm_params
from moshi_tpu.serve.batched_moshi import BatchedMoshiState, handle_chat
from moshi_tpu.serve.metrics import MODEL_STEP_DURATION, TOTAL_STEPS

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--seconds", type=int, default=16)
parser.add_argument("--churn", action="store_true",
                    help="half the slots cycle join/leave every ~20 s")
parser.add_argument("--kv", default="int8", choices=["int8", "int4"])
parser.add_argument("--mimi-dtype", default="f32", choices=["f32", "bf16"])
args = parser.parse_args()
B = args.batch
SECONDS = args.seconds
FRAME = 1920

config = replace(lm_config_v0_1(), kv_cache_dtype=args.kv, context=3000)
lm = LMModel(config)
shapes = jax.eval_shape(
    lambda k: quantize_lm_params(lm.init_params(k, jnp.bfloat16), mode="int8"),
    jax.random.PRNGKey(0))
lm_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
mimi = MimiModel(mimi_v0_1_config(num_codebooks=config.dep_q))
mshapes = jax.eval_shape(lambda k: mimi.init_params(k, jnp.float32),
                         jax.random.PRNGKey(0))
mimi_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), mshapes)

print("building state + warmup...", flush=True)
state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, None, B,
                          jax.random.PRNGKey(0),
                          mimi_dtype=(jnp.bfloat16 if args.mimi_dtype ==
                                      "bf16" else jnp.float32))
t0 = time.time()
state.warmup()
print(f"warmup done in {time.time() - t0:.1f}s", flush=True)


async def client_session(client, idx, results, seconds=None, resume=None,
                         want_resume=False):
    from aiohttp import WSMsgType
    from moshi_tpu import moshi_native
    query = ""
    if want_resume or resume:
        q = ["resume_support=1"] + ([f"resume={resume}"] if resume else [])
        query = "?" + "&".join(q)
    ws = await client.ws_connect("/api/chat" + query)
    hs = await ws.receive_bytes()
    assert hs[:1] == b"\x00"
    resume_id, resumed = None, False
    if want_resume or resume:
        meta = json.loads((await ws.receive_bytes())[1:])
        resume_id, resumed = meta.get("resume_id"), meta.get("resumed", False)
    writer = moshi_native.OpusStreamWriter(24000)
    reader = moshi_native.OpusStreamReader(24000)
    rs = np.random.RandomState(idx)
    sent = 0
    got_samples = 0
    t_start = time.perf_counter()
    n_frames = (seconds or SECONDS) * 1000 // 80

    async def recv():
        nonlocal got_samples
        while True:
            try:
                m = await ws.receive(timeout=5)
            except asyncio.TimeoutError:
                return
            if m.type != WSMsgType.BINARY:
                return
            if m.data[:1] == b"\x01":
                pcm = reader.append_bytes(m.data[1:])
                got_samples += np.frombuffer(pcm, np.float32).size

    recv_task = asyncio.create_task(recv())
    for i in range(n_frames):
        target = t_start + i * 0.080
        delay = target - time.perf_counter()
        if delay > 0:
            await asyncio.sleep(delay)
        frame = (rs.randn(FRAME) * 0.05).astype(np.float32)
        data = writer.append_pcm(frame)
        if data:
            await ws.send_bytes(b"\x01" + data)
        sent += 1
    await asyncio.sleep(1.5)  # drain
    recv_task.cancel()
    await ws.close()
    wall = time.perf_counter() - t_start
    results[idx] = {"frames_sent": sent, "audio_s_received":
                    round(got_samples / 24000, 2), "wall_s": round(wall, 2),
                    **({"resumed": resumed} if (want_resume or resume)
                       else {})}
    return resume_id


async def churn_slot(client, idx, results, deadline):
    """Join/leave repeatedly while others stream (live slot-reset churn).
    Every second rejoin resumes the previous session's snapshot, so the
    per-slot extract/restore path runs under live batched load too."""
    sessions = resumes = 0
    rid = None
    while time.perf_counter() < deadline - 25:
        use_resume = rid if sessions % 2 == 1 else None
        rid = await client_session(client, 1000 * sessions + idx, results,
                                   seconds=20, resume=use_resume,
                                   want_resume=True)
        if use_resume and results[1000 * sessions + idx].get("resumed"):
            resumes += 1
        sessions += 1
        await asyncio.sleep(2.0)
    results[f"churn{idx}"] = {"sessions": sessions, "resumed": resumes}


async def main():
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    app = web.Application()
    app.router.add_get("/api/chat", lambda r: handle_chat(r, state))
    client = TestClient(TestServer(app))
    await client.start_server()
    loop_task = asyncio.create_task(state.run_loop())
    results = {}
    try:
        if args.churn:
            deadline = time.perf_counter() + SECONDS
            long_haul = [client_session(client, i, results)
                         for i in range(B // 2)]
            churners = [churn_slot(client, i, results, deadline)
                        for i in range(B // 2, B)]
            await asyncio.gather(*long_haul, *churners)
        else:
            await asyncio.gather(*[client_session(client, i, results)
                                   for i in range(B)])
    finally:
        loop_task.cancel()
        await client.close()

    h = MODEL_STEP_DURATION
    summary = {
        "clients": B,
        "churn": args.churn,
        "kv": args.kv,
        "seconds_streamed": SECONDS,
        "wraparound_crossed": SECONDS * 1000 // 80 > 3000,
        "total_model_steps": TOTAL_STEPS.value,
        "per_client": results,
        "step_count": h.n,
        "step_mean_ms": round(1000 * h.total / max(h.n, 1), 2),
        "step_buckets_ms": {str(int(b * 1000)): c for b, c in
                            zip(h.buckets, np.cumsum(h.counts[:-1]).tolist())},
    }
    print("RESULT " + json.dumps(summary))


asyncio.run(main())
