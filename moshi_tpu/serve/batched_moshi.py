"""Batched multi-tenant full-duplex Moshi server.

The reference serves one session per model replica (`moshi/moshi/server.py`
asyncio lock, line 160); its batched serving exists only for ASR
(`rust/moshi-server/src/batched_asr.rs`).  This module extends the batched
slot design to the full-duplex dialogue loop — possible here because the
whole frame step is one jitted program over a batch with per-slot exec masks,
and batching amortizes the weight reads (the decode step is weight-bandwidth
bound, so N users cost barely more than one).

Protocol per slot: identical to the single-session server (`\\x00` handshake,
`\\x01` ogg-opus, `\\x02` text).
"""

import argparse
import asyncio
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loaders import CheckpointInfo
from ..models.lm_gen import LMGen, LMGenConfig
from ..models.lm import UNGENERATED_TOKEN
from ..utils.trees import (masked_reset, take_slots, put_slots,
                           state_batch_axes)
from . import protocol as proto
from .metrics import REGISTRY, MODEL_STEP_DURATION, OPEN_CHANNELS, TOTAL_STEPS, CONNECT_COUNT


class BatchedMoshiState:
    def __init__(self, mimi, mimi_params, lm, lm_params, text_tokenizer,
                 batch_size: int, rng: jax.Array, mimi_dtype=jnp.float32,
                 mesh=None, **lm_gen_kwargs):
        # mimi_dtype=bf16 is a serving knob: the codec is ~27-29% of the
        # big-batch frame in f32 (15.8 ms of 58.7 at B=48, 21.7 of 75.4 at
        # B=64 — BENCH_BATCH.md) and bf16 halves it.  Codes are no longer
        # bit-exact vs the reference (RVQ argmin in bf16), so f32 stays the
        # default; opt in via --mimi-dtype bf16 / worker TOML.
        md = jnp.dtype(mimi_dtype)
        if md != jnp.float32:
            mimi_params = jax.tree.map(
                lambda x: x.astype(md)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, mimi_params)
        self.mimi_dtype = md
        self.mimi, self.mimi_params = mimi, mimi_params
        self.lm, self.lm_params = lm, lm_params
        self.text_tokenizer = text_tokenizer
        self.batch_size = batch_size
        self.frame_size = mimi.frame_size
        self.lm_gen = LMGen(lm, LMGenConfig.from_dict(lm_gen_kwargs))

        self.enc_state = mimi.init_encode_state(batch_size, md)
        self.dec_state = mimi.init_decode_state(batch_size, md)
        self.gen_state = self.lm_gen.init_state(batch_size, rng)
        self.skip_frames = np.zeros((batch_size,), np.int32)

        self.slots_free = list(range(batch_size))
        self.slot_queues: dict[int, asyncio.Queue] = {}
        self.slot_pcm: dict[int, np.ndarray] = {}
        self.lock = asyncio.Lock()

        n_in = lm.config.num_codebooks - lm.config.dep_q - 1
        self._n_in = n_in

        def frame(lm_params, mimi_params, gen_state, enc_state, dec_state,
                  pcm, exec_mask):
            codes, enc_state = mimi.encode_step(mimi_params, enc_state,
                                                pcm.astype(md), exec_mask)
            out, gen_state = self.lm_gen.step(lm_params, gen_state,
                                              codes[:, :n_in], exec_mask)
            audio = jnp.clip(out[:, 1:1 + mimi.num_codebooks], 0, None)
            pcm_out, dec_state = mimi.decode_step(mimi_params, dec_state, audio,
                                                  exec_mask)
            return out, pcm_out.astype(jnp.float32), gen_state, enc_state, dec_state

        # Donate the streaming states: without donation the KV cache exists
        # twice (input + output buffers) during the step, which halves the
        # max batch that fits in HBM.
        self._frame = jax.jit(frame, donate_argnums=(2, 3, 4))

        # Exact per-leaf batch axes (a shape heuristic mislocates the batch
        # axis whenever B collides with a layer-stack or kernel dim, e.g.
        # B=8 with the 8-layer full-size Mimi transformer, or B=32 with the
        # 32-layer 7B — per-slot resets then corrupt OTHER slots' state).
        _rng0 = rng
        self._ax_gen = state_batch_axes(
            lambda b: self.lm_gen.init_state(b, _rng0))
        self._ax_enc = state_batch_axes(
            lambda b: mimi.init_encode_state(b, md))
        self._ax_dec = state_batch_axes(
            lambda b: mimi.init_decode_state(b, md))

        # Multi-chip serving over a (dp, tp) jax.sharding.Mesh: LM weights
        # tensor-parallel (parallel/mesh.lm_param_spec, incl. quantized
        # leaves), Mimi replicated, every streaming-state leaf sharded "dp"
        # on its batch axis (from the structural axes above — the KV batch
        # axis is axis 1).  GSPMD inserts the ICI collectives inside the
        # same donated jitted frame; serving semantics are unchanged.
        self.mesh = mesh
        self._chunk_shard = self._mask_shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import lm_param_spec
            assert batch_size % mesh.shape["dp"] == 0, \
                (batch_size, dict(mesh.shape))
            specs = lm_param_spec(self.lm_params, mesh)
            self.lm_params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                self.lm_params, specs)
            repl = NamedSharding(mesh, P())
            self.mimi_params = jax.tree.map(
                lambda x: jax.device_put(x, repl), self.mimi_params)

            def _shard_state(state, axes):
                def _put(x, ax):
                    spec = (P() if ax is None
                            else P(*((None,) * ax + ("dp",))))
                    return jax.device_put(x, NamedSharding(mesh, spec))
                return jax.tree.map(_put, state, axes)

            self.gen_state = _shard_state(self.gen_state, self._ax_gen)
            self.enc_state = _shard_state(self.enc_state, self._ax_enc)
            self.dec_state = _shard_state(self.dec_state, self._ax_dec)
            self._chunk_shard = NamedSharding(mesh, P("dp"))
            self._mask_shard = NamedSharding(mesh, P("dp"))

        def _reset(gen_state, enc_state, dec_state, mask):
            fresh = self.lm_gen.init_state(batch_size, gen_state["rng"])
            # The transformer sub-state is allocated at batch_size *
            # model_batch_mult when CFG doubles the model batch, so its
            # reset mask is tiled the same way as in LMGen._step.
            m_model = jnp.tile(mask, self.lm_gen.model_batch_mult)
            new_gen = dict(gen_state)
            for key in ("cache", "offsets", "transformer", "text_history",
                        "hist_pos"):
                if key not in gen_state:
                    continue
                mk = m_model if key == "transformer" else mask
                new_gen[key] = masked_reset(gen_state[key], fresh[key], mk,
                                            self._ax_gen[key])
            enc_state = masked_reset(enc_state,
                                     mimi.init_encode_state(batch_size, md),
                                     mask, self._ax_enc)
            dec_state = masked_reset(dec_state,
                                     mimi.init_decode_state(batch_size, md),
                                     mask, self._ax_dec)
            return new_gen, enc_state, dec_state

        # Per-slot reset must be jitted WITH donation: a host-side masked
        # reset materializes a complete fresh state (a second full KV cache)
        # next to the live one and OOMs at max batch (found live: B=8 ctx
        # 3000 int8/int8 on a 16 GB v5e).  Inside jit the fresh init fuses
        # into in-place selects on the donated buffers.
        self._reset = jax.jit(_reset, donate_argnums=(0, 1, 2))

        # Per-slot session resume (the batched analog of serve/server.py's
        # snapshot): a disconnecting slot's state — 1/B of the batch pytree —
        # is gathered out on-device and scattered back into whichever slot
        # the user reconnects to.  The shared batch rng is NOT part of a
        # slot's state, so a resumed batched session continues the
        # conversation (KV/delay caches) but not the exact sampling stream.
        from .snapshots import SnapshotStore, RidRegistry
        self._snapshots = SnapshotStore(ttl=60.0, cap=max(8, batch_size))
        self.slot_resume_id = RidRegistry()
        self.slot_resumed: dict[int, bool] = {}
        mult = self.lm_gen.model_batch_mult
        _GEN_KEYS = ("cache", "offsets", "transformer", "text_history",
                     "hist_pos")

        def _extract(gen_state, enc_state, dec_state, slot):
            idx = jnp.asarray([slot])
            idx_m = jnp.concatenate([idx + i * batch_size
                                     for i in range(mult)])
            snap_gen = {}
            for key in _GEN_KEYS:
                if key not in gen_state:
                    continue
                ki = idx_m if key == "transformer" else idx
                kb = batch_size * mult if key == "transformer" else batch_size
                snap_gen[key] = take_slots(gen_state[key], ki, kb,
                                           self._ax_gen[key])
            return (snap_gen,
                    take_slots(enc_state, idx, batch_size, self._ax_enc),
                    take_slots(dec_state, idx, batch_size, self._ax_dec))

        def _restore(gen_state, enc_state, dec_state, snap, slot):
            snap_gen, senc, sdec = snap
            idx = jnp.asarray([slot])
            idx_m = jnp.concatenate([idx + i * batch_size
                                     for i in range(mult)])
            new_gen = dict(gen_state)
            for key, v in snap_gen.items():
                ki = idx_m if key == "transformer" else idx
                kb = batch_size * mult if key == "transformer" else batch_size
                new_gen[key] = put_slots(gen_state[key], v, ki, kb,
                                         self._ax_gen[key])
            return (new_gen,
                    put_slots(enc_state, senc, idx, batch_size, self._ax_enc),
                    put_slots(dec_state, sdec, idx, batch_size, self._ax_dec))

        self._extract = jax.jit(_extract)
        # donating the big states scatters in place (no second full KV); the
        # [1,...] snapshot leaves can't alias [B,...] outputs, so they are
        # not donated — they're dropped from the store on restore instead
        self._restore = jax.jit(_restore, donate_argnums=(0, 1, 2))

    def _put_inputs(self, chunk, mask):
        if self.mesh is None:
            return jnp.asarray(chunk), jnp.asarray(mask)
        return (jax.device_put(chunk, self._chunk_shard),
                jax.device_put(mask, self._mask_shard))

    def _put_mask(self, mask):
        return (jnp.asarray(mask) if self.mesh is None
                else jax.device_put(mask, self._mask_shard))

    def warmup(self):
        pcm, mask = self._put_inputs(
            np.zeros((self.batch_size, 1, self.frame_size), np.float32),
            np.ones((self.batch_size,), bool))
        for _ in range(3):
            # states must be rebound each call: they are donated to the jit
            _, pcm_out, self.gen_state, self.enc_state, self.dec_state = \
                self._frame(self.lm_params, self.mimi_params, self.gen_state,
                            self.enc_state, self.dec_state, pcm, mask)
        jax.block_until_ready(pcm_out)
        self.reset_all()

    def reset_all(self):
        # all-slots reset through the donated jitted reset: allocating a
        # fresh full state next to the live one doubles the KV footprint
        # and OOMs at max batch
        self.gen_state, self.enc_state, self.dec_state = self._reset(
            self.gen_state, self.enc_state, self.dec_state,
            self._put_mask(np.ones((self.batch_size,), bool)))

    def reset_slot(self, slot: int):
        mask = np.zeros((self.batch_size,), bool)
        mask[slot] = True
        self.gen_state, self.enc_state, self.dec_state = self._reset(
            self.gen_state, self.enc_state, self.dec_state,
            self._put_mask(mask))
        self.skip_frames[slot] = 1

    # ------------------------------------------------------------- resume
    def issue_resume_id(self, slot: int) -> str:
        """Announce-ahead token: the client learns it at session start so an
        abrupt drop is still resumable; release_slot snapshots under it."""
        from .snapshots import new_resume_id
        rid = new_resume_id()
        self.slot_resume_id[slot] = rid
        return rid

    def snapshot_slot(self, slot: int):
        """Extract the slot's state and store it under its resume_id (no-op
        unless issue_resume_id was called for this session).  The store
        moves the snapshot to host RAM in the background so it doesn't pin
        1/B of a batch state in HBM; _restore's jit transfers it back.
        Undelivered output frames and unprocessed input audio carry over."""
        rid = self.slot_resume_id.pop(slot, None)
        if rid is None:
            return
        msgs = []
        q = self.slot_queues.get(slot)
        while q is not None and not q.empty():
            msgs.append(q.get_nowait())
        snap = self._extract(self.gen_state, self.enc_state, self.dec_state,
                             np.int32(slot))
        self._snapshots.put(rid, snap,
                            {"msgs": msgs, "pcm": self.slot_pcm.get(slot)})

    def restore_slot(self, slot: int, snap):
        self.gen_state, self.enc_state, self.dec_state = self._restore(
            self.gen_state, self.enc_state, self.dec_state, snap,
            np.int32(slot))
        # the stream continues mid-conversation: no first-frame skip
        self.skip_frames[slot] = 0

    async def acquire_slot(self, resume: str | None = None) -> int | None:
        from .snapshots import await_pending_release
        await await_pending_release(self.slot_resume_id, resume)
        async with self.lock:
            if not self.slots_free:
                return None
            slot = self.slots_free.pop()
            self.slot_queues[slot] = asyncio.Queue()
            self.slot_pcm[slot] = np.zeros((0,), np.float32)
            snap = await self._snapshots.take(resume)
            if snap is not None:
                arrays, meta = snap
                for m in meta.get("msgs", []):
                    self.slot_queues[slot].put_nowait(m)
                if meta.get("pcm") is not None and meta["pcm"].size:
                    self.slot_pcm[slot] = meta["pcm"]
                self.restore_slot(slot, arrays)
                self.slot_resumed[slot] = True
            else:
                self.reset_slot(slot)
                self.slot_resumed[slot] = False
            OPEN_CHANNELS.inc()
            return slot

    async def release_slot(self, slot: int):
        async with self.lock:
            self.snapshot_slot(slot)
            self.slot_queues.pop(slot, None)
            self.slot_pcm.pop(slot, None)
            self.slot_resumed.pop(slot, None)
            self.slots_free.append(slot)
            OPEN_CHANNELS.dec()

    async def run_loop(self):
        """Fire-and-forget batch loop; exceptions are logged, not swallowed."""
        import traceback
        try:
            await self._run_loop()
        except asyncio.CancelledError:
            raise
        except Exception:
            traceback.print_exc()
            raise

    async def _run_loop(self):
        B, fs = self.batch_size, self.frame_size
        next_sweep = 0.0
        while True:
            if len(self._snapshots) and time.time() > next_sweep:
                self._snapshots.sweep()  # expired snapshots free their RAM
                next_sweep = time.time() + 5.0
            ready = [s for s, buf in self.slot_pcm.items() if buf.shape[-1] >= fs]
            if not ready:
                await asyncio.sleep(0.005)
                continue
            mask_np = np.zeros((B,), bool)
            chunk = np.zeros((B, 1, fs), np.float32)
            for s in ready:
                chunk[s, 0] = self.slot_pcm[s][:fs]
                self.slot_pcm[s] = self.slot_pcm[s][fs:]
                if self.skip_frames[s] > 0:
                    # first-frame skip (server.py:136-142): the reference
                    # encodes the frame, discards the codes, and resets the
                    # encoder — state-wise a no-op, so just drop the frame.
                    # (An eager encode here stalled the serve loop ~10 s/slot
                    # through the device tunnel — found live.)
                    self.skip_frames[s] -= 1
                    continue
                mask_np[s] = True
            if not mask_np.any():
                await asyncio.sleep(0)
                continue
            t0 = time.perf_counter()
            chunk_dev, mask_dev = self._put_inputs(chunk, mask_np)
            out, pcm_out, self.gen_state, self.enc_state, self.dec_state = \
                self._frame(self.lm_params, self.mimi_params, self.gen_state,
                            self.enc_state, self.dec_state, chunk_dev,
                            mask_dev)
            # fetch on a worker thread: the device sync would otherwise block
            # the event loop (and every ws client) for the whole step
            out_np, pcm_np = await asyncio.to_thread(
                lambda: (np.asarray(out), np.asarray(pcm_out)))
            MODEL_STEP_DURATION.observe(time.perf_counter() - t0)
            TOTAL_STEPS.inc()
            for s in np.nonzero(mask_np)[0]:
                if (out_np[s] == UNGENERATED_TOKEN).any():
                    continue
                q = self.slot_queues.get(int(s))
                if q is not None:
                    q.put_nowait((pcm_np[s, 0], int(out_np[s, 0, 0])))
            await asyncio.sleep(0)


async def handle_chat(request, state: BatchedMoshiState):
    from aiohttp import web, WSMsgType
    from .. import moshi_native

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    CONNECT_COUNT.inc()
    from .snapshots import wants_resume
    query = dict(request.rel_url.query)
    want_resume = wants_resume(query)
    slot = await state.acquire_slot(query.get("resume"))
    if slot is None:
        await ws.close(code=1013, message=b"server full")
        return ws
    try:
        # everything after acquire runs under the try: a client dropping
        # mid-handshake must still release the slot (a leaked slot
        # permanently shrinks capacity and skews the dispatcher's load)
        reader = moshi_native.OpusStreamReader(state.mimi.sample_rate)
        writer = moshi_native.OpusStreamWriter(state.mimi.sample_rate)
        await ws.send_bytes(proto.handshake())
        if want_resume:
            await ws.send_bytes(proto.msg(proto.MT_METADATA, json.dumps(
                {"resume_id": state.issue_resume_id(slot),
                 "resumed": state.slot_resumed.get(slot, False)}).encode()))
        await _chat_loop(ws, state, slot, reader, writer)
    finally:
        await state.release_slot(slot)
    return ws


async def _chat_loop(ws, state, slot, reader, writer):
    from aiohttp import WSMsgType

    async def sender():
        q = state.slot_queues[slot]
        while True:
            pcm, text_token = await q.get()
            data = writer.append_pcm(np.ascontiguousarray(pcm, np.float32))
            if data:
                await ws.send_bytes(b"\x01" + data)
            if text_token not in (0, 3) and state.text_tokenizer is not None:
                text = state.text_tokenizer.id_to_piece(text_token).replace("▁", " ")
                await ws.send_bytes(b"\x02" + text.encode("utf-8"))

    send_task = asyncio.create_task(sender())
    paused = False
    try:
        async for message in ws:
            if message.type != WSMsgType.BINARY or not message.data:
                continue
            data = message.data
            kind = data[0]
            if kind == proto.MT_AUDIO:
                pcm = np.frombuffer(reader.append_bytes(data[1:]), np.float32)
                if pcm.size and not paused:
                    # backlog cap (hostile-input bound): a client pumping
                    # valid opus faster than real time must not grow the
                    # slot buffer without limit
                    cap = 30 * state.mimi.sample_rate
                    buf = state.slot_pcm[slot]
                    if buf.shape[-1] + pcm.size > cap:
                        pcm = pcm[:max(0, cap - buf.shape[-1])]
                    state.slot_pcm[slot] = np.concatenate([buf, pcm])
            elif kind == proto.MT_CONTROL and len(data) >= 2:
                ctrl = data[1]
                if ctrl == proto.CTRL_PAUSE:
                    paused = True
                    state.slot_pcm[slot] = np.zeros((0,), np.float32)
                elif ctrl == proto.CTRL_START:
                    paused = False
                elif ctrl == proto.CTRL_RESTART:
                    # per-slot reset: fresh streaming state for this user only
                    state.reset_slot(slot)
                    state.slot_pcm[slot] = np.zeros((0,), np.float32)
                    paused = False
                    await ws.send_bytes(proto.msg(
                        proto.MT_METADATA,
                        json.dumps({"event": "restarted"}).encode()))
            elif kind == proto.MT_PING:
                await ws.send_bytes(proto.msg(proto.MT_PING))
            elif kind == proto.MT_ERROR:
                await ws.close()
                break
            # other/unknown message types are discarded (protocol.md:32)
    finally:
        send_task.cancel()


def main():
    from aiohttp import web
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8998)
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--kv-cache", default=None,
                        choices=["model", "int8", "int4"],
                        help="override the KV cache dtype: int8 halves KV "
                             "memory; int4 quarters it (fused flash-decode "
                             "kernel) — see BENCH_BATCH.md for the "
                             "capacity/latency trade-offs")
    parser.add_argument("--mimi-dtype", default="f32",
                        choices=["f32", "bf16"],
                        help="bf16 halves the codec share of the frame at "
                             "large batch (codes no longer bit-exact vs "
                             "the reference)")
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel ways: serve over a (dp, tp) "
                             "mesh of all visible chips (LM weights "
                             "tensor-parallel, batch data-parallel); 0 = "
                             "single device")
    args = parser.parse_args()

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    import contextlib
    from ..parallel.mesh import host_staged_loading
    stage = host_staged_loading() if args.tp else contextlib.nullcontext()
    with stage:
        mimi, mimi_params = info.get_mimi()
        lm, lm_params = info.get_moshi()
    if args.kv_cache:
        from dataclasses import replace
        from ..models.lm import LMModel
        lm = LMModel(replace(lm.config, kv_cache_dtype=args.kv_cache))
    tokenizer = None
    tok_path = Path(args.checkpoint_dir) / info.tokenizer_name
    if tok_path.exists():
        from ..text.spm import SentencePieceTokenizer
        tokenizer = SentencePieceTokenizer(tok_path)

    mesh = None
    if args.tp:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(tp=args.tp)
    state = BatchedMoshiState(mimi, mimi_params, lm, lm_params, tokenizer,
                              args.batch_size, jax.random.PRNGKey(0),
                              mimi_dtype=(jnp.bfloat16 if args.mimi_dtype ==
                                          "bf16" else jnp.float32),
                              mesh=mesh, **info.lm_gen_config)
    state.warmup()

    async def metrics_handler(_):
        return web.Response(text=REGISTRY.expose(), content_type="text/plain")

    async def on_startup(app):
        app["loop_task"] = asyncio.create_task(state.run_loop())

    app = web.Application()
    app.router.add_get("/api/chat", lambda req: handle_chat(req, state))
    app.router.add_get("/metrics", metrics_handler)
    app.on_startup.append(on_startup)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
