"""Batched multi-tenant streaming TTS service.

The reference serves batched TTS through moshi-server's pyo3 py_module (the
embedded `tts.py` batched step loop, py_module.rs:265-283 + TTS_PY): N
websocket channels share one model step over a batch, each with its own DSM
text state machine and word queue.  Here the same design is one jitted batch
frame (temporal forward + depformer + Mimi decode) with per-slot exec masks:

- each connection owns a slot with its own `StateMachine` state, word queue,
  offset, and starvation counter (tts_streaming.rs:28-45 max_consecutive
  pads semantics: a slot with no queued words pauses instead of padding);
- the shared loop steps the union of non-starved active slots; frozen slots
  keep their LM/decoder state bit-exact via exec_mask;
- per-slot audio delays are expressed as a [B, dep_q] zero-mask and a
  per-slot decode validity mask, so slots at different offsets coexist in
  one program.

Wire protocol per connection: identical to the single-session tts_ws module
(JSON "Text"/"Eos" in; b"\\x01"+ogg-opus and JSON word-timing events out).
"""

import asyncio
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lm_gen import LMGen, LMGenConfig
from ..models.lm import UNGENERATED_TOKEN, ZERO_TOKEN
from ..models.tts import Entry
from ..utils.trees import masked_reset, take_slots, put_slots
from .metrics import MODEL_STEP_DURATION, OPEN_CHANNELS, TOTAL_STEPS, CONNECT_COUNT


class _TtsSlot:
    def __init__(self, machine):
        self.state = machine.new_state([])
        self.offset = 0
        self.eos = False
        self.done = False
        self.queue: asyncio.Queue = asyncio.Queue()


class BatchedTTSState:
    def __init__(self, tts, lm_params, mimi_params, batch_size: int,
                 rng: jax.Array, max_consecutive_starved_pads: int = 10,
                 condition_params: dict | None = None,
                 mimi_dtype=jnp.float32):
        # mimi_dtype=bf16 is the same serving knob as batched_moshi's: the
        # f32 codec is a large share of the big-batch frame and bf16 halves
        # it (codes no longer bit-exact; bounds in QUALITY.md) — opt-in.
        md = jnp.dtype(mimi_dtype)
        if md != jnp.float32:
            mimi_params = jax.tree.map(
                lambda x: x.astype(md)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, mimi_params)
        self.mimi_dtype = md
        self.tts = tts
        self.lm_params, self.mimi_params = lm_params, mimi_params
        self.cp_params = condition_params
        self.condition_sum = None
        self.slot_attrs: list = [None] * batch_size
        self.batch_size = batch_size
        lm = tts.lm
        c = lm.config
        self.gen = LMGen(lm, LMGenConfig(
            use_sampling=tts.temp > 0.0, temp=tts.temp, temp_text=tts.temp,
            cfg_coef=tts.cfg_coef, padding_bonus=tts.padding_bonus))
        self.machine = tts.machine
        B = batch_size
        self.gstate = self.gen.init_state(B, rng)
        self.dec_state = tts.mimi.init_decode_state(B, md)
        self._missing = c.num_codebooks - c.dep_q - 1
        self._input = jnp.full((B, max(self._missing, 1), 1), ZERO_TOKEN,
                               jnp.int32)
        self._gen_delays = np.asarray(
            c.delays[c.audio_offset:c.audio_offset + c.dep_q])
        self._valid_after = max(self.gen.max_delay, tts.delay_steps)

        self.slots: list[_TtsSlot | None] = [None] * B
        # gstate/dec_state are donated to the jits inside step_batch, which
        # runs on a worker thread; resets and voice updates from the
        # event-loop thread would race on the same donated buffers (deleted
        # arrays, or a lost reset rebound away by the step).  They are queued
        # here and applied by run_loop between frames instead.  A slot stays
        # in `unready` (skipped by steppable) until its reset has applied.
        self.pending_ops: list[tuple] = []
        self.unready: set[int] = set()
        self.lock = asyncio.Lock()

        mimi, n_q = tts.mimi, tts.n_q

        def depth_decode(lm_params, mimi_params, gstate, dec_state,
                         text_token, h, exec_mask, zero_mask, dec_mask):
            out, gstate = self.gen.depth_step(lm_params, gstate, text_token,
                                              h, exec_mask, None, zero_mask,
                                              None)
            codes = jnp.clip(out[:, 1:n_q + 1], 0, None)
            pcm, dec_state = mimi.decode_step(mimi_params, dec_state, codes,
                                              exec_mask=dec_mask)
            return out, pcm.astype(jnp.float32), gstate, dec_state

        # donate the streaming states (in-place ring-KV scatter; see
        # BENCH_BATCH.md) — every caller rebinds the returned states
        self._main = jax.jit(self.gen.main_step, donate_argnums=1)
        self._depth_decode = jax.jit(depth_decode, donate_argnums=(2, 3))

        # exact per-leaf batch axes: the shape heuristic corrupts other
        # slots when B collides with a layer-stack dim (utils/trees.py)
        from ..utils.trees import state_batch_axes
        _rng0 = rng
        self._ax_gen = state_batch_axes(
            lambda b: self.gen.init_state(b, _rng0))
        self._ax_dec = state_batch_axes(
            lambda b: mimi.init_decode_state(b, md))

        def _reset(gstate, dec_state, mask):
            fresh = self.gen.init_state(batch_size, gstate["rng"])
            m_model = jnp.tile(mask, self.gen.model_batch_mult)
            new_gen = dict(gstate)
            for key in ("cache", "offsets", "transformer", "text_history",
                        "hist_pos"):
                if key not in gstate:
                    continue
                mk = m_model if key == "transformer" else mask
                if key == "transformer":
                    # the live state may carry precomputed cross-attn K/V
                    # that a fresh init lacks; those rows are rebuilt by
                    # _recompute_conditioning, not the masked reset
                    cur = dict(gstate[key])
                    sub = {k2: cur[k2] for k2 in fresh[key]}
                    cur.update(masked_reset(sub, fresh[key], mk,
                                            self._ax_gen[key]))
                    new_gen[key] = cur
                else:
                    new_gen[key] = masked_reset(gstate[key], fresh[key], mk,
                                                self._ax_gen[key])
            dec_state = masked_reset(
                dec_state, mimi.init_decode_state(batch_size, md), mask,
                self._ax_dec)
            return new_gen, dec_state

        # jitted + donated per-slot reset: avoids materializing a second
        # full KV cache next to the live one (OOM at max batch otherwise)
        self._reset = jax.jit(_reset, donate_argnums=(0, 1))

        # per-slot session resume (the TTS analog of batched_moshi's):
        # device rows gathered out / scattered back + the host DSM machine
        # state carried in the snapshot's metadata.  All mutations ride the
        # pending-ops queue like resets (ADVICE r2: never touch donated
        # state from outside the step loop).
        from .snapshots import SnapshotStore, RidRegistry
        self._snapshots = SnapshotStore(ttl=60.0, cap=max(8, batch_size))
        self.slot_resume_id = RidRegistry()
        self.slot_resumed: dict[int, bool] = {}
        mult = self.gen.model_batch_mult
        _GEN_KEYS = ("cache", "offsets", "transformer", "text_history",
                     "hist_pos")

        def _extract(gstate, dec_state, slot):
            idx = jnp.asarray([slot])
            idx_m = jnp.concatenate([idx + i * batch_size
                                     for i in range(mult)])
            snap = {}
            for key in _GEN_KEYS:
                if key not in gstate:
                    continue
                if key == "transformer":
                    # voice cross-attn rows (k_cross/v_cross) are NOT part
                    # of a slot's snapshot — they are rebuilt from the
                    # snapshotted slot_attrs by _recompute_conditioning
                    sub = {k2: gstate[key][k2]
                           for k2 in self._ax_gen[key]}
                    snap[key] = take_slots(sub, idx_m, batch_size * mult,
                                           self._ax_gen[key])
                else:
                    snap[key] = take_slots(gstate[key], idx, batch_size,
                                           self._ax_gen[key])
            return snap, take_slots(dec_state, idx, batch_size,
                                    self._ax_dec)

        def _restore(gstate, dec_state, snap, slot):
            snap_gen, sdec = snap
            idx = jnp.asarray([slot])
            idx_m = jnp.concatenate([idx + i * batch_size
                                     for i in range(mult)])
            new_gen = dict(gstate)
            for key, v in snap_gen.items():
                if key == "transformer":
                    cur = dict(gstate[key])
                    sub = {k2: cur[k2] for k2 in v}
                    cur.update(put_slots(sub, v, idx_m, batch_size * mult,
                                         self._ax_gen[key]))
                    new_gen[key] = cur
                else:
                    new_gen[key] = put_slots(gstate[key], v, idx,
                                             batch_size, self._ax_gen[key])
            return new_gen, put_slots(dec_state, sdec, idx, batch_size,
                                      self._ax_dec)

        self._extract = jax.jit(_extract)
        self._restore = jax.jit(_restore, donate_argnums=(0, 1))

    # ----------------------------------------------------------- slot mgmt
    def issue_resume_id(self, b: int) -> str:
        from .snapshots import new_resume_id
        rid = new_resume_id()
        self.slot_resume_id[b] = rid
        return rid

    async def acquire_slot(self, resume: str | None = None) -> int | None:
        from .snapshots import await_pending_release
        await await_pending_release(self.slot_resume_id, resume)
        async with self.lock:
            for b in range(self.batch_size):
                if self.slots[b] is None:
                    snap = await self._snapshots.take(resume)
                    self.unready.add(b)
                    if snap is not None:
                        arrays, meta = snap
                        slot = meta["slot"]
                        # fresh queue for the new connection, but carry the
                        # undelivered pcm/event/eos items over (dropping
                        # them would gap the audio — and a slot that
                        # finished during the gap would hang the client
                        # waiting for an Eos that never re-arrives)
                        old_q, slot.queue = slot.queue, asyncio.Queue()
                        has_eos = False
                        while not old_q.empty():
                            it = old_q.get_nowait()
                            has_eos = has_eos or it[0] == "eos"
                            slot.queue.put_nowait(it)
                        if slot.done and not has_eos:
                            slot.queue.put_nowait(("eos", None))
                        self.slots[b] = slot
                        self.slot_attrs[b] = meta["attrs"]
                        self.pending_ops.append(("restore", b, arrays))
                        self.slot_resumed[b] = True
                    else:
                        self.pending_ops.append(("reset", b))
                        self.slots[b] = _TtsSlot(self.machine)
                        self.slot_resumed[b] = False
                    OPEN_CHANNELS.inc()
                    CONNECT_COUNT.inc()
                    return b
            return None

    async def release_slot(self, b: int):
        async with self.lock:
            if self.slots[b] is not None:
                # the departed tenant's queued voice updates must not land
                # on the slot's next tenant (cross-tenant voice leak)
                self.pending_ops = [op for op in self.pending_ops
                                    if not (op[0] == "voice" and op[1] == b)]
                rid = self.slot_resume_id.pop(b, None)
                if rid is not None:
                    # reserve NOW so a reconnect faster than one frame waits
                    # for the queued extraction; the snapshot op itself
                    # applies between frames, before any later reset (FIFO)
                    self._snapshots.reserve(rid)
                    self.pending_ops.append(
                        ("snapshot", b, rid, self.slots[b],
                         self.slot_attrs[b]))
                self.slots[b] = None
                self.slot_resumed.pop(b, None)
                OPEN_CHANNELS.dec()

    def apply_pending_ops(self):
        """Drain queued slot resets / voice updates.  Called from run_loop
        between frames (no step in flight) — the only place gstate/dec_state
        may be mutated besides step_batch itself."""
        while self.pending_ops:
            op = self.pending_ops.pop(0)
            if op[0] == "reset":
                self.reset_slot(op[1])
                self.unready.discard(op[1])
            elif op[0] == "voice":
                _, b, emb = op
                self.slot_attrs[b] = self.tts.make_condition_attributes(
                    [emb], None)
                self._recompute_conditioning()
            elif op[0] == "snapshot":
                _, b, rid, slot, attrs = op
                arrays = self._extract(self.gstate, self.dec_state,
                                       np.int32(b))
                self._snapshots.put(rid, arrays,
                                    {"slot": slot, "attrs": attrs})
            elif op[0] == "restore":
                _, b, arrays = op
                self.gstate, self.dec_state = self._restore(
                    self.gstate, self.dec_state, arrays, np.int32(b))
                self._recompute_conditioning()  # rebuild voice rows
                self.unready.discard(b)

    def reset_slot(self, b: int):
        mask = np.zeros((self.batch_size,), bool)
        mask[b] = True
        self.gstate, self.dec_state = self._reset(
            self.gstate, self.dec_state, jnp.asarray(mask))
        if self.slot_attrs[b] is not None:
            # clear the departed session's voice rows so a new voiceless
            # session doesn't attend to them
            self.slot_attrs[b] = None
            self._recompute_conditioning()

    # ------------------------------------------------------------- voices
    def set_slot_voice(self, b: int, voice_embedding: np.ndarray):
        """Per-slot speaker conditioning [T, D] (all slots must use the same
        embedding length, as `TensorCondition.cat` batches them).  Applied
        asynchronously by the step loop (see pending_ops)."""
        tts = self.tts
        if tts.condition_provider is None or self.cp_params is None:
            return
        self.pending_ops.append(
            ("voice", b, np.asarray(voice_embedding, np.float32)[None]))

    def _recompute_conditioning(self):
        from ..conditioners import dropout_all_conditions
        tts = self.tts
        if (tts.condition_provider is None or tts.fuser is None
                or all(a is None for a in self.slot_attrs)):
            self.condition_sum = None
            # strip stale cross-attn K/V rows: transformer.step cross-attends
            # whenever k_cross is present, so leaving the departed speaker's
            # rows would condition new voiceless sessions on them
            if "k_cross" in self.gstate.get("transformer", {}):
                tr = {k2: v2 for k2, v2 in self.gstate["transformer"].items()
                      if k2 not in ("k_cross", "v_cross")}
                self.gstate = {**self.gstate, "transformer": tr}
            return
        template = next(a for a in self.slot_attrs if a is not None)
        null = dropout_all_conditions([template])[0]
        attrs = [a if a is not None else null for a in self.slot_attrs]
        if self.gen.model_batch_mult == 2:
            attrs = attrs + dropout_all_conditions(attrs)
        tensors = tts.condition_provider.prepare_and_provide(
            self.cp_params, attrs)
        self.condition_sum = tts.fuser.get_sum(tensors)
        cross = tts.fuser.get_cross(tensors)
        if cross is not None:
            self.gstate = self.gen.init_cross_state(self.gstate,
                                                    self.lm_params, cross)

    # ------------------------------------------------------------ word feed
    def feed_words(self, b: int, words: list[str]):
        """Normalize + queue text for slot b (rust tts_preprocess.rs)."""
        from ..text.tts_preprocess import (parse_segments, normalize,
                                           BreakTime, MAX_BREAK_S)
        slot = self.slots[b]
        if slot is None:
            return
        for w in words:
            for seg in parse_segments(w):
                if isinstance(seg, BreakTime):
                    if seg.seconds > 0:
                        npad = max(int(min(seg.seconds, MAX_BREAK_S)
                                       * self.tts.mimi.frame_rate), 1)
                        slot.state.entries.append(
                            Entry(tokens=[], text="", padding=npad))
                    continue
                for word in normalize(seg).split():
                    tokens = list(self.tts.tokenizer.encode(word))
                    slot.state.entries.append(Entry(tokens=tokens, text=word))

    def feed_eos(self, b: int):
        if self.slots[b] is not None:
            self.slots[b].eos = True

    # ------------------------------------------------------------- stepping
    def _starved(self, slot: _TtsSlot) -> bool:
        return (not slot.eos and not slot.state.entries
                and not slot.state.queued and slot.state.forced_padding <= 0)

    def _finished(self, slot: _TtsSlot) -> bool:
        return (slot.state.end_step is not None
                and slot.offset >= slot.state.end_step + self.tts.delay_steps
                + self.tts.final_padding)

    def steppable(self) -> list[int]:
        # steppable() is only ever called between steps by the thread driving
        # the loop, so it is the safe point to drain queued state mutations
        self.apply_pending_ops()
        out = []
        for b, slot in enumerate(self.slots):
            if slot is None or slot.done or b in self.unready:
                continue
            if self._finished(slot):
                slot.done = True
                slot.queue.put_nowait(("eos", None))
                continue
            if not self._starved(slot):
                out.append(b)
        return out

    def step_batch(self, active: list[int]):
        """One batched generation frame over the given slots."""
        tts = self.tts
        B = self.batch_size
        exec_np = np.zeros((B,), bool)
        exec_np[active] = True
        exec_mask = jnp.asarray(exec_np)

        text_token, _, h, self.gstate = self._main(
            self.lm_params, self.gstate, self._input, exec_mask,
            self.condition_sum)
        toks = np.asarray(text_token)

        out_tokens = np.zeros((B,), np.int32)
        events: dict[int, list] = {b: [] for b in active}
        for b in active:
            slot = self.slots[b]
            before = len(slot.state.transcript)
            out_tok, _ = self.machine.process(slot.offset, slot.state,
                                              int(toks[b]))
            out_tokens[b] = out_tok
            events[b] = [{"type": "Text", "text": w,
                          "start_s": s / tts.mimi.frame_rate}
                         for w, s in slot.state.transcript[before:]]
            if not slot.eos and slot.state.end_step is not None:
                # ran out of words but the client may send more
                slot.state.end_step = None

        offsets = np.array([self.slots[b].offset if b in set(active) else 0
                            for b in range(B)])
        zero_mask = jnp.asarray(
            offsets[:, None] < self._gen_delays[None, :] + tts.delay_steps)
        valid = np.zeros((B,), bool)
        for b in active:
            valid[b] = self.slots[b].offset + 1 > self._valid_after
        dec_mask = jnp.asarray(valid & exec_np)

        out, pcm, self.gstate, self.dec_state = self._depth_decode(
            self.lm_params, self.mimi_params, self.gstate, self.dec_state,
            jnp.asarray(out_tokens), h, exec_mask, zero_mask, dec_mask)

        out_np = np.asarray(out)
        pcm_np = np.asarray(pcm)
        TOTAL_STEPS.inc()
        for b in active:
            slot = self.slots[b]
            slot.offset += 1
            for e in events[b]:
                slot.queue.put_nowait(("event", e))
            if valid[b] and not (out_np[b] == UNGENERATED_TOKEN).any():
                slot.queue.put_nowait(
                    ("pcm", np.clip(pcm_np[b, 0], -1, 1)))

    async def run_loop(self):
        import time
        while True:
            # steppable() drains pending resets/voice updates first: no step
            # is in flight here, so mutating the donated states is safe
            active = self.steppable()
            if not active:
                await asyncio.sleep(0.005)
                continue
            t0 = time.time()
            # step on a worker thread so device syncs don't block the loop
            await asyncio.to_thread(self.step_batch, active)
            MODEL_STEP_DURATION.observe(time.time() - t0)
            await asyncio.sleep(0)


async def handle_batched_tts_socket(request, state: BatchedTTSState):
    from aiohttp import web, WSMsgType
    from .tts_ws import make_audio_encoder

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    from .snapshots import wants_resume
    query = dict(request.rel_url.query)
    want_resume = wants_resume(query)
    slot = await state.acquire_slot(query.get("resume"))
    if slot is None:
        await ws.send_str(json.dumps({"type": "Error", "message": "full"}))
        await ws.close()
        return ws
    try:
        writer = make_audio_encoder(state.tts.mimi.sample_rate)
        ready = {"type": "Ready"}
        if want_resume:
            ready["resume_id"] = state.issue_resume_id(slot)
            ready["resumed"] = state.slot_resumed.get(slot, False)
        await ws.send_str(json.dumps(ready))
    except Exception:
        await state.release_slot(slot)
        raise

    async def receiver():
        async for message in ws:
            if message.type != WSMsgType.TEXT:
                continue
            try:
                msg = json.loads(message.data)
                mtype = msg.get("type")
                if mtype == "Text":
                    state.feed_words(slot, [str(msg["text"])])
                elif mtype == "Voice":
                    emb = np.asarray(msg["embeddings"],
                                     np.float32).reshape(msg["shape"])
                    state.set_slot_voice(slot, emb)
                elif mtype == "Eos":
                    state.feed_eos(slot)
            except Exception as e:
                # one bad message must not kill the session (or reach the
                # shared batch loop)
                await ws.send_str(json.dumps(
                    {"type": "Error", "message": f"bad message: {e}"}))

    recv_task = asyncio.create_task(receiver())
    try:
        q = state.slots[slot].queue
        while True:
            # race the queue against the receiver: if the client disconnects
            # while its slot is starved (queue never fed again), q.get()
            # alone would hang forever and leak the slot
            q_task = asyncio.ensure_future(q.get())
            done, _ = await asyncio.wait(
                {q_task, recv_task}, return_when=asyncio.FIRST_COMPLETED)
            if q_task not in done:
                q_task.cancel()
                break
            kind, payload = q_task.result()
            if kind == "eos":
                await ws.send_str(json.dumps({"type": "Eos"}))
                break
            if kind == "event":
                await ws.send_str(json.dumps(payload))
            elif kind == "pcm":
                data = writer.append_pcm(
                    np.ascontiguousarray(payload, np.float32))
                if data:
                    await ws.send_bytes(b"\x01" + data)
    finally:
        recv_task.cancel()
        await state.release_slot(slot)
        await ws.close()
    return ws
