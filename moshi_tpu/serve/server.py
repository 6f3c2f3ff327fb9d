"""Full-duplex websocket server, wire-compatible with the reference protocol.

Behavioral reference: `moshi/moshi/server.py` — `ServerState` (39-169):
models in streaming mode with a single-session asyncio lock (160), 4-frame
warmup (62-72), recv loop: opus -> PCM buffer -> frame-size chunks -> encode
-> `lm_gen.step` -> decode -> opus out; first-frame skip + encoder reset
(136-142).  Full binary protocol per `rust/protocol.md:1-31`: handshake(0),
audio(1), text(2), control(3: start/endTurn/pause/restart), metadata(4),
error(5), ping(6); unknown message types are discarded.  Control semantics
in full-duplex mode: pause freezes the session (input discarded), start
resumes, restart resets all streaming state (fresh session in-place);
endTurn is a no-op here (protocol.md: "not used in full streaming mode").

The opus side uses the native C++ `moshi_native` codec (analog of sphn).

Extension beyond the reference: one-shot session resume, opt-in via the
`resume_support`/`resume` query params.  An opted-in session's
MT 4 config echo carries a `resume_id`; on disconnect the full streaming
state (conv tails, ring KV, delay cache, rng) is snapshotted for
`--resume-ttl` seconds, and a client reconnecting with `?resume=<id>`
continues the conversation mid-dialogue instead of starting over.  The
explicit-pytree streaming state makes this free — the reference's
equivalent hook (`get/set_streaming_state`, streaming.py:158-181) is never
used by its serving stack.
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
from . import protocol as proto
from .metrics import OPEN_CHANNELS, CONNECT_COUNT


def log(level: str, msg: str):
    print(f"[{level}] {msg}", flush=True)


class ServerState:
    def __init__(self, checkpoint_info: CheckpointInfo, mimi, mimi_params,
                 lm, lm_params, text_tokenizer, cfg_coef: float = 1.0,
                 rng_seed: int = 0, log_dir: str | None = None,
                 session_timeout: float = 360.0, mesh=None,
                 vault_url: str | None = None, fleet_auth: str | None = None,
                 replicate_every: int = 125, **lm_gen_kwargs):
        self.info = checkpoint_info
        self.mimi, self.mimi_params = mimi, mimi_params
        self.lm, self.lm_params = lm, lm_params
        # multi-chip serving: LM weights tensor-parallel over the mesh
        # (parallel/mesh.lm_param_spec), Mimi + B=1 state replicated — the
        # deployment that needs this is 7B bf16 (~15 GB > one 16 GB chip)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import lm_param_spec
            specs = lm_param_spec(lm_params, mesh)
            self.lm_params = jax.tree.map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                lm_params, specs)
            self._repl = NamedSharding(mesh, P())
            self.mimi_params = jax.tree.map(
                lambda x: jax.device_put(x, self._repl), mimi_params)
        self.text_tokenizer = text_tokenizer
        self.frame_size = mimi.frame_size
        # A cfg_coef stored in the checkpoint's lm_gen_config wins over the
        # constructor default; callers override it explicitly if needed.
        merged = dict(lm_gen_kwargs)
        merged.setdefault("cfg_coef", cfg_coef)
        # hibiki-style confidence-colored text (MT 7, protocol.rs:30-53):
        # on by default for hibiki checkpoints, opt-in otherwise
        self.colored_text = bool(merged.pop(
            "colored_text", checkpoint_info.model_type == "hibiki"))
        self.lm_gen = LMGen(lm, LMGenConfig.from_dict(merged))
        self.lock = asyncio.Lock()
        # ws arrival order for queue-position reporting: asyncio.Lock wakes
        # waiters FIFO, so the index in this list is the live queue position
        # (0 = being served).  The moshi.chat demo queue reported positions
        # out-of-band (client/src/pages/Queue/api/client.ts); here waiting
        # clients get MT 4 {"status": "wait", "queue_position": n} updates
        # on the socket itself, plus the same HTTP API (QueueAPI below).
        self._session_order: list[int] = []
        self._session_counter = 0
        self.rng_seed = rng_seed
        self.log_dir = log_dir
        # reference: 360 s session timeout (moshi-server/src/lm.rs:234-239)
        self.session_timeout = session_timeout
        self.session_tokens: list = []

        # donate the streaming state (arg 1): without donation XLA copies the
        # ring KV cache every step instead of scattering in place (~4 ms/frame
        # on the 7B at ctx 3000).  Callers always rebind the returned state.
        self._encode = jax.jit(self.mimi.encode_step, donate_argnums=1)
        self._decode = jax.jit(self.mimi.decode_step, donate_argnums=1)
        self._step = self._jit_step(self.lm_gen)
        # per-session sampling configs (rust SessionConfigReq,
        # stream_both.rs:93-155): each distinct override set compiles once
        # and is memoized for later sessions
        self._gen_cache: dict[tuple, tuple] = {(): (self.lm_gen, self._step)}
        self._default_gen = (self.lm_gen, self._step)
        self.max_steps = 4500  # rust cap (stream_both.rs:149)
        self.session_seed = rng_seed
        # session-resume snapshots (state-is-data makes this free: the last
        # step's output pytrees ARE the session; reference analog is
        # get/set_streaming_state, streaming.py:158-181, which nothing in
        # the reference serving stack ever calls).  SnapshotStore offloads
        # to host RAM in the background; restore is one-shot because
        # stepping donates the restored buffers.
        from .snapshots import SnapshotStore
        self._snapshots = SnapshotStore(ttl=60.0, cap=4)
        self._resume_id: str | None = None
        # cross-worker migration (fleet dispatcher SnapshotVault): live
        # sessions replicate their state to the vault every
        # `replicate_every` frames (125 = every 10 s of audio), so a killed
        # worker's sessions resume on a replacement worker — beyond the
        # reference, which scales only by whole replicas
        # (moshi-server/src/main.rs:293-302)
        self.vault_url = vault_url.rstrip("/") if vault_url else None
        self.fleet_auth = fleet_auth
        self.replicate_every = replicate_every
        self._session_overrides: dict = {}
        self._push_task = None
        self.reset()

    @property
    def resume_ttl(self) -> float:
        return self._snapshots.ttl

    @resume_ttl.setter
    def resume_ttl(self, v: float):
        self._snapshots.ttl = v

    def _jit_step(self, lm_gen):
        fn = (lm_gen.step_with_text_prob if self.colored_text
              else lm_gen.step)
        return jax.jit(fn, donate_argnums=1)

    # query-param name -> (LMGenConfig field, parser).  Reference names from
    # client Conversation.tsx:58-66 / rust stream_both.rs:93-105.
    _SESSION_PARAMS = {
        "text_temperature": ("temp_text", float),
        "text_topk": ("top_k_text", int),
        "audio_temperature": ("temp", float),
        "audio_topk": ("top_k", int),
        "pad_mult": ("padding_bonus", float),
        "repetition_penalty": ("text_rep_penalty", float),
        "repetition_penalty_context": ("text_rep_context", int),
    }
    # any of these marks a moshi_tpu-aware client: it gets the MT 4 config
    # echo and live queue-position updates (bare clients see the exact
    # reference wire sequence — handshake first)
    _KNOWN_PARAMS = (set(_SESSION_PARAMS) |
                     {"text_seed", "audio_seed", "max_steps",
                      "resume", "resume_support"})

    def apply_session_config(self, query) -> dict:
        """Select (or build) the LMGen for this session's sampling overrides.

        `query` is a str->str mapping (ws URL query params).  Unknown keys
        are ignored; seeds and max_steps are handled outside LMGenConfig.
        Returns the effective session config (the rust MetaData analog) for
        the metadata echo."""
        overrides = {}
        for name, (field, parse) in self._SESSION_PARAMS.items():
            if name in query:
                try:
                    overrides[field] = parse(query[name])
                except ValueError:
                    pass
        seed = self.rng_seed
        for name in ("text_seed", "audio_seed"):
            if name in query:
                try:
                    # one PRNG drives both text and audio sampling here; fold
                    # both seeds in so either changes the stream
                    seed = (seed * 1000003 + int(query[name])) & 0x7FFFFFFF
                except ValueError:
                    pass
        self.session_seed = seed
        try:
            self.max_steps = min(4500, int(query.get("max_steps", 4500)))
        except ValueError:
            self.max_steps = 4500
        self._session_overrides = dict(overrides)
        self.lm_gen, self._step = self._gen_for_overrides(overrides)
        return self._session_cfg_dict()

    def _gen_for_overrides(self, overrides: dict):
        """Memoized (LMGen, jitted step) for a sampling-override set (also
        used to rebuild a migrated session's config on this worker)."""
        from dataclasses import replace as _replace
        key = tuple(sorted(overrides.items()))
        if key not in self._gen_cache:
            gen = LMGen(self.lm, _replace(self.lm_gen.gc, **overrides))
            self._gen_cache[key] = (gen, self._jit_step(gen))
            log("info", f"compiled session config {overrides}")
        return self._gen_cache[key]

    def _session_cfg_dict(self) -> dict:
        """The effective session config (the rust MetaData analog)."""
        c = self.lm_gen.gc
        return {"text_temperature": c.temp_text, "text_topk": c.top_k_text,
                "audio_temperature": c.temp, "audio_topk": c.top_k,
                "pad_mult": c.padding_bonus,
                "repetition_penalty": c.text_rep_penalty,
                "repetition_penalty_context": c.text_rep_context,
                "max_steps": self.max_steps, "seed": self.session_seed}

    def reset(self):
        self.enc_state = self.mimi.init_encode_state(1)
        self.dec_state = self.mimi.init_decode_state(1)
        self.gen_state = self.lm_gen.init_state(
            1, jax.random.PRNGKey(self.session_seed))
        if self.mesh is not None:
            self.enc_state, self.dec_state, self.gen_state = jax.tree.map(
                lambda x: jax.device_put(x, self._repl),
                (self.enc_state, self.dec_state, self.gen_state))
        self.steps_done = 0

    def warmup(self):
        """Compile all jitted steps with 4 zero frames (server.py:62-72)."""
        for _ in range(4):
            chunk = jnp.zeros((1, 1, self.frame_size), jnp.float32)
            codes, self.enc_state = self._encode(self.mimi_params, self.enc_state, chunk)
            if self.colored_text:
                out, _, self.gen_state = self._step(self.lm_params,
                                                    self.gen_state, codes)
            else:
                out, self.gen_state = self._step(self.lm_params,
                                                 self.gen_state, codes)
            if (np.asarray(out) != UNGENERATED_TOKEN).all():
                _, self.dec_state = self._decode(self.mimi_params, self.dec_state,
                                                 jnp.clip(out[:, 1:], 0, None))
        self.reset()

    def step_frame(self, chunk: np.ndarray):
        """One 80 ms frame: encode -> lm step -> decode.
        Returns (pcm [T] float32 | None, text_token | None, confidence |
        None — the sampled text token's probability when colored_text)."""
        self.steps_done += 1
        codes, self.enc_state = self._encode(self.mimi_params, self.enc_state,
                                             jnp.asarray(chunk)[None, None])
        prob = None
        if self.colored_text:
            out, prob_dev, self.gen_state = self._step(
                self.lm_params, self.gen_state, codes)
        else:
            out, self.gen_state = self._step(self.lm_params, self.gen_state,
                                             codes)
        out_np = np.asarray(out)
        if (out_np == UNGENERATED_TOKEN).any():
            self._maybe_replicate()
            return None, None, None
        if self.colored_text:
            prob = float(np.asarray(prob_dev)[0])
        self.session_tokens.append(out_np[0, :, 0])
        pcm, self.dec_state = self._decode(self.mimi_params, self.dec_state,
                                           jnp.clip(out[:, 1:], 0, None))
        self._maybe_replicate()
        return np.asarray(pcm)[0, 0], int(out_np[0, 0, 0]), prob

    def set_image_embeddings(self, emb: np.ndarray):
        """Route precomputed image/speaker embeddings [T, kv_dim] into the
        cross-attention K/V cache (MT 8 path for the v0_1_vision presets;
        the gated cross-attention consumes them every subsequent frame)."""
        if not self.lm.config.cross_attention:
            raise ValueError("model has no cross-attention")
        src = jnp.asarray(emb, jnp.float32)[None]
        if self.lm_gen.model_batch_mult == 2:
            src = jnp.tile(src, (2, 1, 1))
        self.gen_state = self.lm_gen.init_cross_state(
            self.gen_state, self.lm_params, src)

    def save_session_log(self):
        """Per-connection token log (moshi-server/src/lm.rs:256-290)."""
        if not self.log_dir or not self.session_tokens:
            self.session_tokens = []
            return
        from pathlib import Path
        from safetensors.flax import save_file
        Path(self.log_dir).mkdir(parents=True, exist_ok=True)
        tokens = jnp.asarray(np.stack(self.session_tokens))  # [T, 1+dep_q]
        path = Path(self.log_dir) / f"session-{int(time.time())}.safetensors"
        save_file({"text_tokens": tokens[:, 0], "audio_tokens": tokens[:, 1:].T},
                  str(path))
        log("info", f"saved session log to {path}")
        self.session_tokens = []

    def reset_encoder(self):
        self.enc_state = self.mimi.init_encode_state(1)

    # ------------------------------------------------------------- resume
    def _store_snapshot(self):
        """Snapshot the full streaming state at disconnect, keyed by the
        resume_id announced to the client at session start.  Multiple
        snapshots are kept (so queued users' resumes survive intervening
        sessions), offloaded to host RAM by the store."""
        rid = self._resume_id
        self._resume_id = None
        if rid is None:
            return
        self._snapshots.put(
            rid, (self.enc_state, self.dec_state, self.gen_state),
            {"steps": self.steps_done, "gen_pair": (self.lm_gen, self._step),
             "max_steps": self.max_steps})
        # the disconnect snapshot also goes to the fleet vault, so the
        # client can land on a DIFFERENT worker when it reconnects
        self._vault_push(rid, {"enc": self.enc_state, "dec": self.dec_state,
                               "gen": self.gen_state})

    # ------------------------------------------------- cross-worker vault
    def _vault_meta(self) -> dict:
        return {"steps": self.steps_done, "max_steps": self.max_steps,
                "overrides": self._session_overrides}

    def _vault_push(self, rid: str, arrays: dict):
        """Serialize + POST a session snapshot to the fleet vault in the
        background.  `arrays` must be safe to read concurrently with the
        session's next (donated) step — callers pass freshly device-copied
        buffers (or post-disconnect state that will never step again)."""
        if not (self.vault_url and self.fleet_auth):
            return
        meta = self._vault_meta()

        async def _push():
            from .snapshots import serialize_snapshot
            import aiohttp
            # one device->host transfer, inside the encoder, off the loop
            blob = await asyncio.to_thread(serialize_snapshot, arrays, meta)
            try:
                async with aiohttp.ClientSession() as s:
                    async with s.post(
                            f"{self.vault_url}/snapshot/{rid}", data=blob,
                            headers={"X-Fleet-Auth": self.fleet_auth},
                            timeout=aiohttp.ClientTimeout(total=30)) as r:
                        if r.status != 200:
                            log("warning",
                                f"vault push {rid}: HTTP {r.status}")
            except Exception as e:
                log("warning", f"vault push {rid} failed: {e}")

        try:
            self._push_task = asyncio.ensure_future(_push())
        except RuntimeError:
            pass  # no running loop (sync tests): vault is a serving feature

    def _maybe_replicate(self):
        """Periodic live replication: every `replicate_every` frames, push a
        device-side COPY of the streaming state to the vault (the copy is
        enqueued before the next donated step, so device ordering keeps it
        consistent; the background device_get then reads only the copy)."""
        if (self._resume_id is None or not self.vault_url
                or not self.replicate_every
                or self.steps_done % self.replicate_every != 0):
            return
        if self._push_task is not None and not self._push_task.done():
            return  # previous push still in flight: skip this interval
        snap = jax.tree.map(jnp.copy, {"enc": self.enc_state,
                                       "dec": self.dec_state,
                                       "gen": self.gen_state})
        self._vault_push(self._resume_id, snap)

    async def _vault_pull(self, rid: str):
        """Fetch + deserialize a migrated session from the fleet vault.
        Returns a SnapshotStore-shaped item or None."""
        if not (self.vault_url and self.fleet_auth):
            return None
        import aiohttp
        try:
            async with aiohttp.ClientSession() as s:
                async with s.get(
                        f"{self.vault_url}/snapshot/{rid}",
                        headers={"X-Fleet-Auth": self.fleet_auth},
                        timeout=aiohttp.ClientTimeout(total=30)) as r:
                    if r.status != 200:
                        return None
                    blob = await r.read()
        except Exception as e:
            log("warning", f"vault pull {rid} failed: {e}")
            return None
        from .snapshots import deserialize_snapshot
        arrays, meta = await asyncio.to_thread(deserialize_snapshot, blob)
        gen_pair = self._gen_for_overrides(
            dict(meta.get("overrides") or {}))
        log("info", f"session {rid} migrated in from the fleet vault "
                    f"(step {meta['steps']})")
        return ((arrays["enc"], arrays["dec"], arrays["gen"]),
                {"steps": int(meta["steps"]), "gen_pair": gen_pair,
                 "max_steps": int(meta["max_steps"])})

    async def _take_snapshot(self, token: str | None) -> bool:
        """Restore the snapshot if `token` matches and it hasn't expired.
        One-shot: the restored buffers are donated on the next step (host
        leaves transfer back on the first jitted call).  Falls back to the
        fleet vault (a session migrating in from another worker) on a
        local miss."""
        item = await self._snapshots.take(token)
        if item is None and token:
            item = await self._vault_pull(token)
        if item is None:
            return False
        (enc, dec, gen), meta = item
        if self.mesh is not None:
            put = lambda t: jax.tree.map(  # noqa: E731
                lambda x: jax.device_put(x, self._repl), t)
        else:
            put = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
        self.enc_state, self.dec_state = put(enc), put(dec)
        self.gen_state = put(gen)
        self.steps_done = meta["steps"]
        self.lm_gen, self._step = meta["gen_pair"]
        self.max_steps = meta["max_steps"]
        return True

    def _text_msg(self, text: str, prob: float | None) -> bytes:
        """MT 2 text, or MT 7 confidence-colored text when colored_text:
        payload = 1 color byte (0-10 index into the client's 11-level
        diverging palette, client TextDisplay.tsx) + utf-8 text."""
        if prob is None:
            return proto.msg(proto.MT_TEXT, text.encode("utf-8"))
        color = max(0, min(10, int(round(prob * 10))))
        return proto.msg(proto.MT_COLOREDTEXT,
                         bytes([color]) + text.encode("utf-8"))

    # ---------------------------------------------------------------- serving
    async def handle_chat(self, request):
        from aiohttp import web

        ws = web.WebSocketResponse()
        await ws.prepare(request)
        log("info", "accepted connection")
        CONNECT_COUNT.inc()
        sid = self._session_counter
        self._session_counter += 1
        self._session_order.append(sid)
        # queue-position updates are opt-in (any moshi_tpu session param):
        # bare reference clients expect the handshake as the FIRST message
        # (protocol.md) and must simply block while queued, as they do
        # against the reference server's lock
        notify = bool(self._KNOWN_PARAMS & set(request.rel_url.query))
        try:
            if not await self._acquire_session(ws, sid, notify):
                return ws  # client went away while queued
        except Exception:
            self._session_order.remove(sid)
            raise
        OPEN_CHANNELS.inc()  # live-load signal for the fleet dispatcher
        try:
            await self._serve_session(ws, request)
        finally:
            OPEN_CHANNELS.dec()
            self._session_order.remove(sid)
            self.lock.release()
        return ws

    async def _acquire_session(self, ws, sid, notify: bool) -> bool:
        """FIFO-acquire the single-session lock, reporting queue position to
        the waiting client via MT 4 once a second when `notify` (opted-in
        clients only — the reference wire sequence starts with the
        handshake).  Returns False (without holding the lock) if the client
        disconnects while queued."""
        acquire = asyncio.ensure_future(self.lock.acquire())
        try:
            while not acquire.done():
                pos = self._session_order.index(sid)
                if pos > 0 and notify:
                    try:
                        await ws.send_bytes(proto.msg(
                            proto.MT_METADATA,
                            json.dumps({"status": "wait",
                                        "queue_position": pos}).encode()))
                    except Exception:
                        # any send failure means the client is gone; a
                        # leaked acquire would deadlock the session lock
                        raise asyncio.CancelledError
                if ws.closed:
                    raise asyncio.CancelledError
                await asyncio.wait({acquire}, timeout=1.0)
            return True
        except asyncio.CancelledError:
            acquire.cancel()
            # if acquire won the race with the cancellation, release
            try:
                await acquire
            except asyncio.CancelledError:
                pass
            else:
                self.lock.release()
            self._session_order.remove(sid)
            log("info", f"queued client {sid} disconnected")
            return False

    async def _serve_session(self, ws, request):
        from .. import moshi_native
        # lazy opus: raw-PCM clients (and non-opus sample rates in
        # tests) never need the codec
        class _LazyOpus:
            def __init__(self, cls, rate):
                self._cls, self._rate, self._inst = cls, rate, None

            def __getattr__(self, name):
                if self._inst is None:
                    self._inst = self._cls(self._rate)
                return getattr(self._inst, name)

        opus_writer = _LazyOpus(moshi_native.OpusStreamWriter,
                                self.mimi.sample_rate)
        opus_reader = _LazyOpus(moshi_native.OpusStreamReader,
                                self.mimi.sample_rate)
        query = dict(request.rel_url.query)
        resumed = await self._take_snapshot(query.get("resume"))
        if resumed:
            # conversation continues from the disconnected session's state;
            # explicit sampling overrides win over the snapshot's config
            if set(self._SESSION_PARAMS) & set(query):
                session_cfg = self.apply_session_config(query)
                # the restored state lacks the repetition-penalty history
                # leaves if the original session had the penalty off (or a
                # different context width) — reconcile, losing only the
                # penalty window, not the conversation
                gc = self.lm_gen.gc
                if gc.rep_penalty_on:
                    th = self.gen_state.get("text_history")
                    if th is None or th.shape[1] != gc.text_rep_context:
                        self.gen_state = dict(self.gen_state)
                        self.gen_state["text_history"] = jnp.full(
                            (1, gc.text_rep_context), -1, jnp.int32)
                        self.gen_state["hist_pos"] = jnp.zeros((1,),
                                                               jnp.int32)
            else:
                session_cfg = self._session_cfg_dict()
            log("info", f"session resumed at step {self.steps_done}")
        else:
            session_cfg = self.apply_session_config(query)
            self.reset()
            self.session_tokens = []
        # issue a resume_id only to clients that opted in: bare reference
        # clients are never told the id, so storing a snapshot for them
        # would only churn real users' entries out of the capped store
        from .snapshots import new_resume_id, wants_resume
        self._resume_id = new_resume_id() if wants_resume(query) else None
        if self._resume_id is not None:
            session_cfg["resume_id"] = self._resume_id
        session_cfg["resumed"] = resumed
        # strict 8-byte handshake payload (rust/protocol.md:11-13);
        # the bare-b"\x00" Python-reference form is still accepted
        # by our clients
        await ws.send_bytes(proto.handshake())
        # echo the effective session config (rust MetaData,
        # stream_both.rs:158-176) — only when the client passed session
        # params (or opted into resume), so bare clients see the reference
        # wire sequence
        if self._KNOWN_PARAMS & set(query):
            await ws.send_bytes(proto.msg(
                proto.MT_METADATA, json.dumps(session_cfg).encode()))
        try:
            await asyncio.wait_for(
                self._recv_loop(ws, opus_reader, opus_writer,
                                skip_frames=0 if resumed else 1),
                timeout=self.session_timeout)
        except asyncio.TimeoutError:
            # policy end, not a network blip: resuming past the timeout
            # would defeat --session-timeout via client auto-reconnect
            self._resume_id = None
            log("info", "session timeout")
        finally:
            self._store_snapshot()
            self.save_session_log()
            log("info", "connection closed")

    async def _recv_loop(self, ws, opus_reader, opus_writer,
                         skip_frames: int = 1):
        from aiohttp import WSMsgType
        all_pcm = np.zeros((0,), np.float32)
        paused = False
        raw_pcm = False  # client opted into raw-f32 frames (web client)
        async for message in ws:
            if message.type in (WSMsgType.ERROR, WSMsgType.CLOSED):
                break
            if message.type != WSMsgType.BINARY or len(message.data) == 0:
                continue
            data = message.data
            kind = data[0]
            if kind == proto.MT_PCM and raw_pcm:
                # raw-PCM extension: MT 10 carries f32le 24 kHz mono frames in
                # both directions once negotiated via metadata (the
                # dependency-free web client path; 10 is unassigned in the
                # reference protocol, protocol.rs:7-53, so reference peers
                # simply discard it)
                pcm = np.frombuffer(
                    data[1:len(data) - (len(data) - 1) % 4], np.float32)
                if paused or pcm.size == 0:
                    continue
                all_pcm = np.concatenate([all_pcm, pcm])
                while all_pcm.shape[-1] >= self.frame_size:
                    chunk, all_pcm = (all_pcm[:self.frame_size],
                                      all_pcm[self.frame_size:])
                    if skip_frames:
                        _ = self._encode(self.mimi_params, self.enc_state,
                                         jnp.asarray(chunk)[None, None])
                        self.reset_encoder()
                        skip_frames -= 1
                        continue
                    out_pcm, text_token, prob = self.step_frame(chunk)
                    if self.steps_done >= self.max_steps:
                        log("info", f"max_steps {self.max_steps} reached")
                        self._resume_id = None  # terminal end: no snapshot
                        await ws.close()
                        return
                    if out_pcm is None:
                        continue
                    await ws.send_bytes(
                        proto.msg(proto.MT_PCM,
                                  np.ascontiguousarray(out_pcm, np.float32)
                                  .tobytes()))
                    if text_token not in (0, 3) and self.text_tokenizer is not None:
                        text = self.text_tokenizer.id_to_piece(text_token)
                        text = text.replace("▁", " ")
                        await ws.send_bytes(self._text_msg(text, prob))
                continue
            if kind == proto.MT_CONTROL and len(data) >= 2:
                ctrl = data[1]
                log("info", f"control: {proto.CONTROL_NAMES.get(ctrl, ctrl)}")
                if ctrl == proto.CTRL_PAUSE:
                    paused = True
                    all_pcm = np.zeros((0,), np.float32)
                elif ctrl == proto.CTRL_START:
                    paused = False
                elif ctrl == proto.CTRL_RESTART:
                    # fresh session in place: reset all streaming state,
                    # re-apply the first-frame skip, flush buffers
                    self.save_session_log()
                    self.reset()
                    all_pcm = np.zeros((0,), np.float32)
                    skip_frames = 1
                    paused = False
                    await ws.send_bytes(proto.msg(
                        proto.MT_METADATA,
                        json.dumps({"event": "restarted"}).encode()))
                # endTurn: not used in full streaming mode (protocol.md:19)
                continue
            if kind == proto.MT_METADATA:
                try:
                    meta = json.loads(data[1:].decode("utf-8"))
                except (UnicodeDecodeError, json.JSONDecodeError):
                    meta = None
                if isinstance(meta, dict) and meta.get("raw_pcm"):
                    raw_pcm = True
                    await ws.send_bytes(proto.msg(
                        proto.MT_METADATA,
                        json.dumps({"raw_pcm": True,
                                    "sample_rate": self.mimi.sample_rate,
                                    "frame_size": self.frame_size}).encode()))
                log("info", f"client metadata: {meta}")
                continue
            if kind == proto.MT_ERROR:
                log("error", f"client error: {data[1:].decode('utf-8', 'replace')}")
                await ws.close()
                break
            if kind == proto.MT_PING:
                await ws.send_bytes(proto.msg(proto.MT_PING))
                continue
            if kind == proto.MT_IMAGE:
                # image/speaker embeddings for the vision presets: payload =
                # u32 T + u32 kv_dim + f32le data (MT 8, protocol.rs:40; the
                # reference defines the type but ships no vision tower — we
                # accept precomputed embeddings and route them to the gated
                # cross-attention, lm.rs v0_1_vision)
                import struct as _struct
                try:
                    t_, dim_ = _struct.unpack("<II", data[1:9])
                    emb = np.frombuffer(
                        data[9:9 + 4 * t_ * dim_], "<f4").reshape(t_, dim_)
                    self.set_image_embeddings(emb)
                    await ws.send_bytes(proto.msg(
                        proto.MT_METADATA,
                        json.dumps({"image": "ok", "frames": t_}).encode()))
                except (ValueError, _struct.error) as e:
                    await ws.send_bytes(proto.msg(proto.MT_ERROR,
                                                  str(e).encode()))
                continue
            if kind != proto.MT_AUDIO:
                continue  # unknown message types are discarded (protocol.md:32)
            if paused:
                # paused sessions discard input (opus stream still consumed so
                # the decoder stays in sync)
                opus_reader.append_bytes(data[1:])
                continue
            pcm = np.frombuffer(opus_reader.append_bytes(data[1:]), np.float32)
            if pcm.size == 0:
                continue
            all_pcm = np.concatenate([all_pcm, pcm])
            while all_pcm.shape[-1] >= self.frame_size:
                t0 = time.time()
                chunk, all_pcm = all_pcm[:self.frame_size], all_pcm[self.frame_size:]
                if skip_frames:
                    # First input frame is in the past from the model's view;
                    # re-apply encoder left padding on the next call
                    # (server.py:136-142).
                    _ = self._encode(self.mimi_params, self.enc_state,
                                     jnp.asarray(chunk)[None, None])
                    self.reset_encoder()
                    skip_frames -= 1
                    continue
                out_pcm, text_token, prob = self.step_frame(chunk)
                if self.steps_done >= self.max_steps:
                    log("info", f"max_steps {self.max_steps} reached")
                    self._resume_id = None  # terminal end: no snapshot
                    await ws.close()
                    return
                if out_pcm is None:
                    continue
                opus_bytes = opus_writer.append_pcm(
                    np.ascontiguousarray(out_pcm, np.float32))
                if opus_bytes:
                    await ws.send_bytes(b"\x01" + opus_bytes)
                if text_token not in (0, 3) and self.text_tokenizer is not None:
                    text = self.text_tokenizer.id_to_piece(text_token)
                    text = text.replace("▁", " ")
                    await ws.send_bytes(self._text_msg(text, prob))
                log("info", f"frame handled in {1000 * (time.time() - t0):.1f}ms")


class QueueAPI:
    """HTTP session-queue API, wire-shaped like the moshi.chat demo service
    the reference web client polls (client/src/pages/Queue/api/client.ts +
    validators.ts): `GET /add_user?queue_id=` -> {session_id,
    session_auth_id}; `GET /check_user?session_id=&session_auth_id=` ->
    {session_id, status: "wait"|"ready", worker_auth_id, worker_addr,
    current_position}; `GET /user_feedback` -> logged ack.  That service is
    not in the reference repo (the client talks to kyutai's hosted infra) —
    this implementation fronts this server's own single-session lock:
    status flips to "ready" when every earlier HTTP ticket is gone
    (checked-in tickets expire after `ttl` seconds without a poll) AND the
    ws lock has a free slot for this ticket."""

    def __init__(self, state: ServerState, worker_addr: str, ttl: float = 30.0):
        from .dispatcher import TicketQueue
        self.state = state
        self.worker_addr = worker_addr
        self.queue = TicketQueue(ttl)  # shared core with the fleet dispatcher

    async def add_user(self, request):
        from aiohttp import web
        out = self.queue.add()
        log("info", f"queue: ticket {out['session_id']} issued "
                    f"(queue_id={request.rel_url.query.get('queue_id')})")
        return web.json_response(out)

    async def check_user(self, request):
        from aiohttp import web
        q = request.rel_url.query
        try:
            sid = int(q.get("session_id", ""))
        except ValueError:
            return web.Response(status=400, text="bad session_id")
        out = self.queue.check(
            sid, q.get("session_auth_id"),
            lambda: None if self.state.lock.locked() else self.worker_addr)
        if out is None:
            return web.Response(status=404, text="unknown session")
        return web.json_response(out)

    async def user_feedback(self, request):
        from aiohttp import web
        q = request.rel_url.query
        log("info", f"user_feedback: {dict(q)}")
        return web.json_response({"ok": True})

    def add_routes(self, app):
        app.router.add_get("/add_user", self.add_user)
        app.router.add_get("/check_user", self.check_user)
        app.router.add_get("/user_feedback", self.user_feedback)


def main():
    from aiohttp import web

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", default=8998, type=int)
    parser.add_argument("--checkpoint-dir", required=True,
                        help="Directory with config.json + safetensors weights.")
    parser.add_argument("--cfg-coef", type=float, default=1.0)
    parser.add_argument("--static", type=str, default=None)
    parser.add_argument("--log-dir", type=str, default=None,
                        help="save per-session token logs (safetensors)")
    parser.add_argument("--session-timeout", type=float, default=360.0)
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel ways: serve over a (dp=1, tp) "
                             "mesh of all visible chips; 0 = single device")
    parser.add_argument("--advertised-addr", default=None,
                        help="ws address the queue API hands to clients "
                             "(default: derived from --host/--port, which "
                             "is wrong behind NAT / 0.0.0.0 binds)")
    parser.add_argument("--resume-ttl", type=float, default=60.0,
                        help="seconds a disconnected session stays resumable "
                             "via ?resume=<resume_id> (0 disables)")
    parser.add_argument("--vault", default=None, metavar="URL",
                        help="fleet dispatcher base URL for cross-worker "
                             "session migration (live sessions replicate "
                             "snapshots there; resumes fall back to it)")
    parser.add_argument("--fleet-auth", default=None,
                        help="shared secret for the dispatcher vault")
    parser.add_argument("--replicate-every", type=int, default=125,
                        help="frames between live snapshot pushes to the "
                             "vault (125 = 10 s of audio)")
    parser.add_argument("--kv-cache", default=None,
                        choices=["model", "int8", "int4"],
                        help="override the KV cache dtype (memory/latency "
                             "trade-off; see BENCH_BATCH.md)")
    parser.add_argument("--ssl", metavar="CERT_DIR", default=None,
                        help="serve https/wss (self-signed cert generated "
                             "in CERT_DIR if absent), like the reference "
                             "server.py --ssl")
    args = parser.parse_args()

    info = CheckpointInfo.from_dir(args.checkpoint_dir)
    import contextlib
    from ..parallel.mesh import host_staged_loading
    stage = host_staged_loading() if args.tp else contextlib.nullcontext()
    with stage:
        log("info", "loading mimi")
        mimi, mimi_params = info.get_mimi()
        log("info", "loading moshi")
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

    # --cfg-coef overrides a cfg_coef stored in the checkpoint's lm_gen_config
    gen_cfg = dict(info.lm_gen_config)
    ckpt_cfg_coef = gen_cfg.pop("cfg_coef", 1.0)
    cfg_coef = args.cfg_coef if args.cfg_coef != 1.0 else ckpt_cfg_coef
    mesh = None
    if args.tp:
        from ..parallel.mesh import make_mesh
        # single-session: use exactly tp chips (dp=1 — no batch to split)
        mesh = make_mesh(args.tp, tp=args.tp)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, tokenizer,
                        cfg_coef, log_dir=args.log_dir,
                        session_timeout=args.session_timeout, mesh=mesh,
                        vault_url=args.vault, fleet_auth=args.fleet_auth,
                        replicate_every=args.replicate_every,
                        **gen_cfg)
    state.resume_ttl = args.resume_ttl
    log("info", "warming up")
    state.warmup()

    ssl_context = None
    if args.ssl:
        from .worker import make_ssl_context
        ssl_context = make_ssl_context(args.ssl)
    app = web.Application()
    app.router.add_get("/api/chat", state.handle_chat)
    ws_scheme = "wss" if ssl_context else "ws"
    addr = (args.advertised_addr
            or f"{ws_scheme}://{args.host}:{args.port}/api/chat")
    QueueAPI(state, addr).add_routes(app)
    if args.static:
        import os

        async def handle_root(_):
            return web.FileResponse(os.path.join(args.static, "index.html"))

        app.router.add_get("/", handle_root)
        app.router.add_static("/", path=args.static, follow_symlinks=True,
                              name="static")
    scheme = "https" if ssl_context else "http"
    log("info", f"serving at {scheme}://{args.host}:{args.port}")
    web.run_app(app, host=args.host, port=args.port, ssl_context=ssl_context)


if __name__ == "__main__":
    main()
