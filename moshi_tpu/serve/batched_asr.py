"""Batched multi-tenant streaming ASR server, wire-compatible with the
reference `moshi-server` batched-ASR module.

Behavioral reference: `rust/moshi-server/src/batched_asr.rs` + `asr.rs`:
- each websocket connection is allocated a slot in a fixed batch; one shared
  real-time model loop steps all active slots together over a `StreamMask`
  (inactive slots frozen), per-slot reset on connect/disconnect
  (`batched_asr.rs:163-260`, `kv_cache.rs:92-95`);
- wire protocol is msgpack maps tagged by "type" in both directions
  (`asr.rs:15-33`, rmp_serde with_struct_map):
    in:  Init | Marker{id} | Audio{pcm: [f32]} | OggOpus{data: bytes}
    out: Ready | Word{text, start_time} | EndWord{stop_time} |
         Marker{id} | Step{step_idx, prs, buffered_pcm} | Error{message}
- Markers echo back once all data buffered at registration time has been
  processed AND the ASR delay has passed:
  due = step_idx + asr_delay_in_tokens + buffered_frames
  (`batched_asr.rs:314-327, 422-433`);
- Step messages carry the extra-head (VAD) probabilities per active slot
  plus that slot's buffered-pcm backlog (`batched_asr.rs:406-419`).

TPU-native: the batch step is one jitted program; slot desynchronization is
an exec mask.  A raw-f32-pcm legacy byte framing (b"\\x01"+opus /
b"\\x08"+f32le) is also accepted for simple clients; msgpack maps start with
0x80-0x8f/0xde/0xdf so the two framings cannot collide.
"""

import argparse
import asyncio
import time
from pathlib import Path

import numpy as np

from .metrics import REGISTRY, MODEL_STEP_DURATION, OPEN_CHANNELS, TOTAL_STEPS, CONNECT_COUNT


def _packb(obj) -> bytes:
    import msgpack
    return msgpack.packb(obj, use_single_float=True)


def _unpackb(data: bytes):
    import msgpack
    return msgpack.unpackb(data)


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
        # slot -> [(due_step, marker_id)], FIFO per slot (batched_asr.rs:23-41)
        self.slot_markers: dict[int, list] = {}
        # Queued slot ops (reset / snapshot / restore).  `self.state` is
        # donated to the jits inside `step_pcm`, which runs on a worker
        # thread — and `asr.items` is read by that thread too — so all
        # mutation happens in `_run_loop`, which drains this list between
        # frames; a slot is never stepped before its reset/restore applies
        # because ops drain before the frame's exec mask is built.
        self.pending_ops: list[tuple] = []
        self.frame_size = asr.mimi.frame_size
        self.lock = asyncio.Lock()

        # per-slot session resume: device rows (mimi + transformer) via the
        # structural-axes gather/scatter, host _ItemState (word accumulation,
        # per-item step clock) deep-copied into the snapshot's metadata
        from .snapshots import SnapshotStore, RidRegistry
        self._snapshots = SnapshotStore(ttl=60.0,
                                        cap=max(8, self.batch_size))
        self.slot_resume_id = RidRegistry()
        self.slot_resumed: dict[int, bool] = {}
        # single-slot extract/restore live on StreamingASR (they route the
        # chunked-mimi layout on the host; jitted + donated there)
        self._extract = asr.extract_slot_arrays
        self._restore = asr.restore_slot_arrays

    def issue_resume_id(self, slot: int) -> str:
        from .snapshots import new_resume_id
        rid = new_resume_id()
        self.slot_resume_id[slot] = rid
        return rid

    async def acquire_slot(self, resume: str | None = None) -> int | None:
        from .snapshots import await_pending_release
        await await_pending_release(self.slot_resume_id, resume)
        async with self.lock:
            if not self.slots_free:
                return None
            slot = self.slots_free.pop()
            self.slot_queues[slot] = asyncio.Queue()
            self.slot_pcm[slot] = np.zeros((0,), np.float32)
            self.slot_markers[slot] = []
            snap = await self._snapshots.take(resume)
            if snap is not None:
                arrays, meta = snap
                # undelivered messages / unprocessed audio / pending markers
                # from the dropped connection carry over
                for m in meta.get("msgs", []):
                    self.slot_queues[slot].put_nowait(m)
                if meta.get("pcm") is not None and meta["pcm"].size:
                    self.slot_pcm[slot] = meta["pcm"]
                self.slot_markers[slot] = list(meta.get("markers") or [])
                self.pending_ops.append(("restore", slot, meta["item"],
                                         arrays))
                self.slot_resumed[slot] = True
            else:
                self.pending_ops.append(("reset", slot))
                self.slot_resumed[slot] = False
            OPEN_CHANNELS.inc()
            return slot

    async def release_slot(self, slot: int):
        async with self.lock:
            rid = self.slot_resume_id.pop(slot, None)
            q = self.slot_queues.pop(slot, None)
            pcm = self.slot_pcm.pop(slot, None)
            markers = self.slot_markers.pop(slot, None)
            if rid is not None:
                # reserve NOW so a reconnect faster than one batch frame
                # waits for the queued extraction instead of starting fresh;
                # undelivered messages / audio / markers ride the snapshot
                msgs = []
                while q is not None and not q.empty():
                    msgs.append(q.get_nowait())
                self._snapshots.reserve(rid)
                self.pending_ops.append(("snapshot", slot, rid,
                                         {"msgs": msgs, "pcm": pcm,
                                          "markers": markers}))
            self.slots_free.append(slot)
            self.slot_resumed.pop(slot, None)
            OPEN_CHANNELS.dec()

    # Backlog cap (hostile-input bound): a client pumping audio faster than
    # real time would otherwise grow its slot buffer without limit.  The
    # reference reports `buffered_pcm` and relies on well-behaved clients;
    # here excess past the cap is dropped and the handler tells the client.
    MAX_BUFFERED_SECONDS = 30.0

    def feed_pcm(self, slot: int, pcm: np.ndarray) -> bool:
        """Append audio to the slot's backlog.  Returns False (dropping the
        excess) once the backlog exceeds MAX_BUFFERED_SECONDS."""
        cap = int(self.MAX_BUFFERED_SECONDS * self.asr.mimi.sample_rate)
        buf = self.slot_pcm[slot]
        if buf.shape[-1] + pcm.shape[-1] > cap:
            pcm = pcm[:max(0, cap - buf.shape[-1])]
            self.slot_pcm[slot] = np.concatenate([buf, pcm])
            return False
        self.slot_pcm[slot] = np.concatenate([buf, pcm])
        return True

    def add_marker(self, slot: int, marker_id: int):
        """Register a time-alignment marker: it is echoed back once all
        currently-buffered audio has been processed and the ASR delay has
        passed (batched_asr.rs:314-327)."""
        buffered_frames = self.slot_pcm.get(slot, np.zeros(0)).shape[-1] // self.frame_size
        due = self.asr.model_step_idx + self.asr.asr_delay_in_tokens + buffered_frames
        self.slot_markers.setdefault(slot, []).append((due, int(marker_id)))

    async def run_loop(self):
        """The shared real-time batch loop (batched_asr.rs:225-260).  Runs as
        a fire-and-forget task: exceptions are logged, not swallowed."""
        import traceback
        try:
            await self._run_loop()
        except asyncio.CancelledError:
            raise
        except Exception:
            traceback.print_exc()
            raise

    async def _run_loop(self):
        fs = self.frame_size
        B = self.batch_size
        while True:
            # apply queued slot ops first: no step is in flight here (the
            # to_thread below was awaited), so donating self.state and
            # touching asr.items is safe
            while self.pending_ops:
                op = self.pending_ops.pop(0)
                if op[0] == "reset":
                    self.state = self.asr.reset_batch_idx(self.state, op[1])
                elif op[0] == "snapshot":
                    import copy
                    _, slot_, rid, leftovers = op
                    arrays = self._extract(self.state, np.int32(slot_))
                    self._snapshots.put(
                        rid, arrays,
                        {"item": copy.deepcopy(self.asr.items[slot_]),
                         **leftovers})
                elif op[0] == "restore":
                    _, slot_, item, arrays = op
                    self.asr.items[slot_] = item
                    self.state = self._restore(self.state, arrays,
                                               np.int32(slot_))
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
            # step on a worker thread: the device syncs inside step_pcm would
            # otherwise block the event loop (and every ws client)
            msgs, self.state = await asyncio.to_thread(
                self.asr.step_pcm, self.mimi_params, self.lm_params,
                self.state, chunk, mask)
            MODEL_STEP_DURATION.observe(time.perf_counter() - t0)
            TOTAL_STEPS.inc()
            for m in msgs:
                self._dispatch(m, mask)
            self._flush_markers()
            await asyncio.sleep(0)

    def _dispatch(self, m, mask):
        from ..models.asr import AsrWord, AsrEndWord, AsrStep
        if isinstance(m, AsrWord):
            self._send(m.batch_idx, {"type": "Word", "text": m.text or "",
                                     "start_time": m.start_time})
        elif isinstance(m, AsrEndWord):
            self._send(m.batch_idx, {"type": "EndWord", "stop_time": m.stop_time})
        elif isinstance(m, AsrStep):
            # per-slot columns of the [num_heads, B] probs (batched_asr.rs:406-419)
            for b in np.nonzero(mask)[0]:
                b = int(b)
                if b not in self.slot_queues:
                    continue
                self._send(b, {
                    "type": "Step", "step_idx": int(m.step_idx),
                    "prs": [float(p) for p in np.asarray(m.prs)[:, b]],
                    "buffered_pcm": int(self.slot_pcm.get(
                        b, np.zeros(0)).shape[-1]),
                })

    def _flush_markers(self):
        step_idx = self.asr.model_step_idx
        for slot, markers in self.slot_markers.items():
            while markers and markers[0][0] <= step_idx:
                _, marker_id = markers.pop(0)
                self._send(slot, {"type": "Marker", "id": marker_id})

    def _send(self, slot: int, payload: dict):
        q = self.slot_queues.get(slot)
        if q is not None:
            q.put_nowait(payload)


async def handle_asr_socket(request, state: BatchedAsrState):
    from aiohttp import web, WSMsgType

    ws = web.WebSocketResponse(autoping=True, heartbeat=10.0)
    await ws.prepare(request)
    CONNECT_COUNT.inc()
    from .snapshots import wants_resume
    query = dict(request.rel_url.query)
    want_resume = wants_resume(query)
    slot = await state.acquire_slot(query.get("resume"))
    if slot is None:
        await ws.send_bytes(_packb({"type": "Error", "message": "server full"}))
        await ws.close()
        return ws
    try:
        reader = None  # opus reader created lazily (raw-pcm clients skip it)
        ready = {"type": "Ready"}
        if want_resume:
            ready["resume_id"] = state.issue_resume_id(slot)
            ready["resumed"] = state.slot_resumed.get(slot, False)
        await ws.send_bytes(_packb(ready))
    except Exception:
        # a client dropping mid-handshake must still release the slot
        await state.release_slot(slot)
        raise

    async def sender():
        q = state.slot_queues[slot]
        while True:
            msg = await q.get()
            await ws.send_bytes(_packb(msg))

    def opus_pcm(data: bytes) -> np.ndarray:
        nonlocal reader
        if reader is None:
            from .. import moshi_native
            reader = moshi_native.OpusStreamReader(state.asr.mimi.sample_rate)
        return np.frombuffer(reader.append_bytes(data), np.float32)

    send_task = asyncio.create_task(sender())
    backlog_warned = False
    try:
        async for message in ws:
            if message.type != WSMsgType.BINARY or not message.data:
                continue
            data = message.data
            # Hostile-input isolation: a malformed message (bad msgpack
            # field types, truncated payloads, non-1-D pcm, ...) earns the
            # offending client an Error message but must never kill the
            # handler mid-stream, leak the slot, or reach the shared batch
            # loop (the rust server gets this from typed rmp_serde decode,
            # asr.rs:15-33).
            try:
                kind = data[0]
                if kind == 1:  # legacy framing: ogg-opus audio
                    pcm = opus_pcm(data[1:])
                elif kind == 8:  # legacy framing: raw f32le pcm
                    pcm = np.frombuffer(
                        data[1:len(data) - (len(data) - 1) % 4], np.float32)
                else:
                    try:
                        msg = _unpackb(data)
                        mtype = msg.get("type")
                    except Exception:
                        continue  # unknown msgs are discarded (protocol.md:32)
                    if mtype == "Init":
                        await ws.send_bytes(_packb({"type": "Ready"}))
                        continue
                    if mtype == "Marker":
                        state.add_marker(slot, int(msg["id"]))
                        continue
                    if mtype == "Audio":
                        pcm = np.asarray(msg["pcm"], np.float32).reshape(-1)
                    elif mtype == "OggOpus":
                        pcm = opus_pcm(msg["data"])
                    else:
                        continue
            except Exception as e:
                await ws.send_bytes(_packb(
                    {"type": "Error", "message": f"bad message: {e}"}))
                continue
            if pcm.size:
                if not state.feed_pcm(slot, pcm) and not backlog_warned:
                    backlog_warned = True
                    await ws.send_bytes(_packb(
                        {"type": "Error",
                         "message": "audio backlog cap reached; "
                                    "excess dropped"}))
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
    parser.add_argument("--kv-cache", default=None,
                        choices=["model", "int8", "int4"],
                        help="override the KV cache dtype: bf16 KV OOMs "
                             "between B=128 and B=256 on a 16 GB v5e; int8 "
                             "halves the per-user cache (BENCH_TTS_ASR.md)")
    parser.add_argument("--context", type=int, default=None,
                        help="override the attention context window "
                             "(per-user KV memory scales with it)")
    parser.add_argument("--weights", default=None, choices=["int8", "int4"],
                        help="quantize LM weights after load")
    parser.add_argument("--mimi-dtype", default="f32",
                        choices=["f32", "bf16"],
                        help="bf16 halves the codec share of the frame at "
                             "large batch (codes not bit-exact — QUALITY.md)")
    parser.add_argument("--conditioning-delay", type=float, default=None,
                        help="continuous `delay` conditioning value "
                             "(asr.rs:55-67); required for checkpoints with "
                             "a delay conditioner")
    parser.add_argument("--mimi-chunks", type=int, default=1,
                        help="split the mimi encoder into N sequential "
                             "batch chunks (avoids the B>=512 remat cliff "
                             "— BENCH_TTS_ASR.md)")
    args = parser.parse_args()

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    from ..models.asr import asr_sum_condition
    from ..utils.serving import apply_serving_overrides
    lm, lm_params, mimi_params, mimi_dtype = apply_serving_overrides(
        lm, lm_params, mimi_params, kv_cache=args.kv_cache,
        context=args.context, weights=args.weights,
        mimi_dtype=args.mimi_dtype)
    cond = asr_sum_condition(
        info, lm.config.dim,
        conditioning_delay=(args.conditioning_delay
                            if args.conditioning_delay is not None
                            else info.stt_config.get("conditioning_delay")))
    tokenizer = SentencePieceTokenizer(Path(args.checkpoint_dir) / info.tokenizer_name)
    delay = int(info.stt_config.get("audio_delay_seconds", 0.5) * mimi.frame_rate)
    asr = StreamingASR(mimi, lm, args.batch_size, asr_delay_in_tokens=delay,
                       temperature=args.temperature, text_tokenizer=tokenizer,
                       mimi_dtype=mimi_dtype, sum_condition=cond,
                       mimi_chunks=args.mimi_chunks)
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
