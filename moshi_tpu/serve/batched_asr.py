"""Batched multi-tenant streaming ASR server.

Behavioral reference: `rust/moshi-server/src/batched_asr.rs` (163-260): each
websocket connection is allocated a slot in a fixed batch; one shared
real-time model loop steps all active slots together over a `StreamMask`
(inactive slots frozen), per-slot reset on connect/disconnect
(`asr.rs:255-264`, `kv_cache.rs:92-95`).  Events are sent to each client as
JSON text frames: {"type": "Word", "text", "start_time"}, {"type": "EndWord",
"stop_time"}, {"type": "Step", "prs"}, {"type": "Ready"}, {"type": "Marker"}.

TPU-native: the batch step is one jitted program; slots' desynchronization is
an exec mask (the `streaming.py:183-211` semantics covered by
tests/test_exec_mask.py).
"""

import argparse
import asyncio
import json
import time
from pathlib import Path

import numpy as np

from .metrics import REGISTRY, MODEL_STEP_DURATION, OPEN_CHANNELS, TOTAL_STEPS, CONNECT_COUNT


class BatchedAsrState:
    def __init__(self, asr, mimi_params, lm_params, rng):
        self.asr = asr
        self.mimi_params = mimi_params
        self.lm_params = lm_params
        self.batch_size = asr.batch_size
        self.state = asr.init_state(rng)
        self.slots_free = list(range(self.batch_size))
        self.slot_queues: dict[int, asyncio.Queue] = {}
        self.slot_pcm: dict[int, np.ndarray] = {}
        self.frame_size = asr.mimi.frame_size
        self.lock = asyncio.Lock()

    async def acquire_slot(self) -> int | None:
        async with self.lock:
            if not self.slots_free:
                return None
            slot = self.slots_free.pop()
            self.slot_queues[slot] = asyncio.Queue()
            self.slot_pcm[slot] = np.zeros((0,), np.float32)
            self.state = self.asr.reset_batch_idx(self.state, slot)
            OPEN_CHANNELS.inc()
            return slot

    async def release_slot(self, slot: int):
        async with self.lock:
            self.slot_queues.pop(slot, None)
            self.slot_pcm.pop(slot, None)
            self.slots_free.append(slot)
            OPEN_CHANNELS.dec()

    def feed_pcm(self, slot: int, pcm: np.ndarray):
        self.slot_pcm[slot] = np.concatenate([self.slot_pcm[slot], pcm])

    async def run_loop(self):
        """The shared real-time batch loop (batched_asr.rs:225-260)."""
        fs = self.frame_size
        B = self.batch_size
        while True:
            ready = [s for s, buf in self.slot_pcm.items() if buf.shape[-1] >= fs]
            if not ready:
                await asyncio.sleep(0.005)
                continue
            mask = np.zeros((B,), bool)
            chunk = np.zeros((B, 1, fs), np.float32)
            for s in ready:
                mask[s] = True
                chunk[s, 0] = self.slot_pcm[s][:fs]
                self.slot_pcm[s] = self.slot_pcm[s][fs:]
            t0 = time.perf_counter()
            msgs, self.state = self.asr.step_pcm(
                self.mimi_params, self.lm_params, self.state, chunk,
                exec_mask=mask)
            MODEL_STEP_DURATION.observe(time.perf_counter() - t0)
            TOTAL_STEPS.inc()
            for m in msgs:
                payload = _msg_to_json(m, self.asr)
                if payload is None:
                    continue
                batch_idx, data = payload
                q = self.slot_queues.get(batch_idx)
                if q is not None:
                    q.put_nowait(data)
            await asyncio.sleep(0)


def _msg_to_json(m, asr):
    from ..models.asr import AsrWord, AsrEndWord, AsrStep
    if isinstance(m, AsrWord):
        return m.batch_idx, {"type": "Word", "text": m.text,
                             "tokens": [int(t) for t in m.tokens],
                             "start_time": m.start_time}
    if isinstance(m, AsrEndWord):
        return m.batch_idx, {"type": "EndWord", "stop_time": m.stop_time}
    if isinstance(m, AsrStep):
        return None  # per-batch step probs are broadcast; skip in ws stream
    return None


async def handle_asr_socket(request, state: BatchedAsrState):
    from aiohttp import web, WSMsgType
    from .. import moshi_native

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    CONNECT_COUNT.inc()
    slot = await state.acquire_slot()
    if slot is None:
        await ws.send_str(json.dumps({"type": "Error", "message": "server full"}))
        await ws.close()
        return ws
    reader = None  # opus reader created lazily (raw-pcm clients don't need it)
    await ws.send_str(json.dumps({"type": "Ready"}))

    async def sender():
        q = state.slot_queues[slot]
        while True:
            msg = await q.get()
            await ws.send_str(json.dumps(msg))

    send_task = asyncio.create_task(sender())
    try:
        async for message in ws:
            if message.type != WSMsgType.BINARY or not message.data:
                continue
            kind = message.data[0]
            if kind == 1:  # ogg-opus audio
                if reader is None:
                    reader = moshi_native.OpusStreamReader(
                        state.asr.mimi.sample_rate)
                pcm = np.frombuffer(reader.append_bytes(message.data[1:]),
                                    np.float32)
                if pcm.size:
                    state.feed_pcm(slot, pcm)
            elif kind == 8:  # raw f32 pcm (convenience extension)
                pcm = np.frombuffer(message.data[1:], np.float32)
                state.feed_pcm(slot, pcm)
    finally:
        send_task.cancel()
        await state.release_slot(slot)
    return ws


def main():
    import jax
    from aiohttp import web
    from ..models.loaders import CheckpointInfo
    from ..models.asr import StreamingASR
    from ..text.spm import SentencePieceTokenizer

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8999)
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--temperature", type=float, default=0.0)
    args = parser.parse_args()

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    tokenizer = SentencePieceTokenizer(Path(args.checkpoint_dir) / info.tokenizer_name)
    delay = int(info.stt_config.get("audio_delay_seconds", 0.5) * mimi.frame_rate)
    asr = StreamingASR(mimi, lm, args.batch_size, asr_delay_in_tokens=delay,
                       temperature=args.temperature, text_tokenizer=tokenizer)
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))

    async def metrics_handler(_):
        return web.Response(text=REGISTRY.expose(),
                            content_type="text/plain")

    async def build_info(_):
        import subprocess
        try:
            rev = subprocess.check_output(["git", "rev-parse", "HEAD"],
                                          text=True).strip()
        except Exception:
            rev = "unknown"
        return web.json_response({"build_git_revision": rev,
                                  "framework": "moshi_tpu"})

    async def on_startup(app):
        app["loop_task"] = asyncio.create_task(state.run_loop())

    app = web.Application()
    app.router.add_get("/api/asr-streaming",
                       lambda req: handle_asr_socket(req, state))
    app.router.add_get("/metrics", metrics_handler)
    app.router.add_get("/api/build_info", build_info)
    app.on_startup.append(on_startup)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
