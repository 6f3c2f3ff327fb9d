"""Standalone Mimi tokenizer websocket module.

Analog of the reference moshi-server `Mimi` module and `rustymimi`'s
`StreamTokenizer` (rust/mimi-pyo3/src/lib.rs): streaming encode/decode as a
service.  Binary protocol per message:
  -> b"\\x01" + float32 PCM (multiple of frame_size)   encode request
  <- b"\\x09" + int32 codes [K * n_frames]              codes reply
  -> b"\\x09" + int32 codes [K * n_frames]              decode request
  <- b"\\x01" + float32 PCM                             audio reply
"""

import numpy as np

import jax
import jax.numpy as jnp


class MimiWsState:
    def __init__(self, mimi, mimi_params):
        self.mimi = mimi
        self.params = mimi_params
        self._encode = jax.jit(mimi.encode_step, donate_argnums=1)
        self._decode = jax.jit(mimi.decode_step, donate_argnums=1)

    def new_session(self):
        return {"enc": self.mimi.init_encode_state(1),
                "dec": self.mimi.init_decode_state(1),
                "buf": np.zeros((0,), np.float32)}

    def encode_pcm(self, sess, pcm: np.ndarray) -> np.ndarray | None:
        # One fixed-shape [1, 1, frame_size] step per frame: a single jitted
        # program regardless of how the client chunks its audio.  Encoding
        # n frames in one [1, 1, n*fs] call would compile a fresh XLA
        # program for every distinct n — a hostile client could force
        # unbounded recompiles (seconds each) just by varying payload sizes.
        fs = self.mimi.frame_size
        sess["buf"] = np.concatenate([sess["buf"], pcm])
        n = sess["buf"].shape[-1] // fs
        if n == 0:
            return None
        chunk, sess["buf"] = sess["buf"][:n * fs], sess["buf"][n * fs:]
        outs = []
        for i in range(n):
            codes, sess["enc"] = self._encode(
                self.params, sess["enc"],
                jnp.asarray(chunk[i * fs:(i + 1) * fs])[None, None])
            outs.append(np.asarray(codes)[0])
        return np.concatenate(outs, axis=-1)  # [K, n]

    def decode_codes(self, sess, codes: np.ndarray) -> np.ndarray:
        # fixed-shape [1, K, 1] steps for the same reason as encode_pcm
        if codes.shape[-1] == 0:
            return np.zeros((0,), np.float32)
        outs = []
        for i in range(codes.shape[-1]):
            pcm, sess["dec"] = self._decode(self.params, sess["dec"],
                                            jnp.asarray(codes[:, i:i + 1])[None])
            outs.append(np.asarray(pcm)[0, 0])
        return np.concatenate(outs, axis=-1)


async def handle_mimi_socket(request, state: MimiWsState):
    from aiohttp import web, WSMsgType

    ws = web.WebSocketResponse()
    await ws.prepare(request)
    sess = state.new_session()
    K = state.mimi.num_codebooks
    async for message in ws:
        if message.type != WSMsgType.BINARY or not message.data:
            continue
        kind = message.data[0]
        payload = message.data[1:]
        if kind == 1:
            # tolerate ragged payloads: truncate to whole f32 samples
            pcm = np.frombuffer(payload[:len(payload) - len(payload) % 4],
                                np.float32)
            codes = state.encode_pcm(sess, pcm)
            if codes is not None:
                await ws.send_bytes(b"\x09" + codes.astype(np.int32).tobytes())
        elif kind == 9:
            flat = np.frombuffer(payload[:len(payload) - len(payload) % 4],
                                 np.int32)
            if flat.size == 0 or flat.size % K:
                continue  # malformed codes payload: discarded
            codes = flat.reshape(K, -1)
            pcm = state.decode_codes(sess, codes)
            await ws.send_bytes(b"\x01" + pcm.astype(np.float32).tobytes())
    return ws


class Tokenizer:
    """Offline drop-in analog of `rustymimi.Tokenizer`
    (rust/mimi-pyo3/src/lib.rs): encode/decode whole arrays plus
    `encode_step`/`decode_step` streaming."""

    def __init__(self, mimi, mimi_params):
        self.mimi = mimi
        self.params = mimi_params
        self._enc_state = None
        self._dec_state = None
        self._encode_step = jax.jit(mimi.encode_step, donate_argnums=1)
        self._decode_step = jax.jit(mimi.decode_step, donate_argnums=1)

    def encode(self, pcm: np.ndarray) -> np.ndarray:
        """pcm [B, 1, T] -> codes [B, K, n]."""
        return np.asarray(self.mimi.encode(self.params, jnp.asarray(pcm)))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(self.mimi.decode(self.params, jnp.asarray(codes)))

    def encode_step(self, pcm: np.ndarray) -> np.ndarray:
        if self._enc_state is None:
            self._enc_state = self.mimi.init_encode_state(pcm.shape[0])
        codes, self._enc_state = self._encode_step(self.params, self._enc_state,
                                                   jnp.asarray(pcm))
        return np.asarray(codes)

    def decode_step(self, codes: np.ndarray) -> np.ndarray:
        if self._dec_state is None:
            self._dec_state = self.mimi.init_decode_state(codes.shape[0])
        pcm, self._dec_state = self._decode_step(self.params, self._dec_state,
                                                 jnp.asarray(codes))
        return np.asarray(pcm)

    def reset(self):
        self._enc_state = None
        self._dec_state = None


class StreamTokenizer:
    """Background-thread streaming codec, the `rustymimi.StreamTokenizer`
    analog (rust/mimi-pyo3/src/lib.rs:239-364): `encode(pcm_1d)` /
    `decode(codes_2d)` enqueue work for dedicated worker threads (each
    owning its own streaming state), `get_encoded()` / `get_decoded()`
    poll results without blocking (None when empty).  This is the codec
    half of the two-process local app pattern (moshi_mlx local.py:155:
    mic + codec in one process, LM in another).

    pcm chunks must be positive multiples of `mimi.frame_size`; codes are
    [K, n] int32 per chunk, decoded pcm is 1-D float32."""

    def __init__(self, mimi, mimi_params):
        import queue
        import threading
        self.mimi, self.params = mimi, mimi_params
        self._q = queue
        self._enc_in: queue.Queue = queue.Queue()
        self._enc_out: queue.Queue = queue.Queue()
        self._dec_in: queue.Queue = queue.Queue()
        self._dec_out: queue.Queue = queue.Queue()
        self._encode_step = jax.jit(mimi.encode_step, donate_argnums=1)
        self._decode_step = jax.jit(mimi.decode_step, donate_argnums=1)
        for fn in (self._enc_loop, self._dec_loop):
            threading.Thread(target=fn, daemon=True).start()

    def _enc_loop(self):
        state = self.mimi.init_encode_state(1)
        while True:
            pcm = self._enc_in.get()
            if pcm is None:
                return
            try:
                codes, state = self._encode_step(
                    self.params, state, jnp.asarray(pcm)[None, None])
                self._enc_out.put(np.asarray(codes)[0])
            except Exception as e:  # parked for get_encoded to re-raise
                self._enc_out.put(e)

    def _dec_loop(self):
        state = self.mimi.init_decode_state(1)
        while True:
            codes = self._dec_in.get()
            if codes is None:
                return
            try:
                pcm, state = self._decode_step(self.params, state,
                                               jnp.asarray(codes)[None])
                self._dec_out.put(np.asarray(pcm)[0, 0])
            except Exception as e:  # parked for get_decoded to re-raise
                self._dec_out.put(e)

    def encode(self, pcm: np.ndarray):
        pcm = np.ascontiguousarray(pcm, np.float32)
        if pcm.size == 0 or pcm.size % self.mimi.frame_size:
            raise ValueError(f"pcm length {pcm.size} is not a positive "
                             f"multiple of frame_size {self.mimi.frame_size}")
        self._enc_in.put(pcm)

    def decode(self, codes: np.ndarray):
        self._dec_in.put(np.ascontiguousarray(codes, np.int32))

    def _poll(self, q):
        try:
            out = q.get_nowait()
        except self._q.Empty:
            return None
        if isinstance(out, Exception):
            raise out  # surfaced from the worker thread, which stays alive
        return out

    def get_encoded(self) -> np.ndarray | None:
        return self._poll(self._enc_out)

    def get_decoded(self) -> np.ndarray | None:
        return self._poll(self._dec_out)

    def close(self):
        self._enc_in.put(None)
        self._dec_in.put(None)


# ---------------------------------------------------------------- broadcast
class MimiRoom:
    """One broadcast room (reference moshi-server mimi.rs: a single producer
    streams Text and raw mimi Codes; the server decodes codes to PCM and
    fans the encoded audio out to any number of listeners)."""

    def __init__(self, state: MimiWsState):
        self.state = state
        self.sess = state.new_session()
        from .tts_ws import make_audio_encoder
        self.writer = make_audio_encoder(state.mimi.sample_rate)
        # ogg header pages (BOS + tags) for late joiners (mimi.rs
        # header_message); the raw-f32 fallback has no header
        hdr = self.writer.append_pcm(np.zeros((0,), np.float32))
        self.header = hdr or b""
        self.listeners: set = set()
        self.producer_active = False
        self.pcm_pending = np.zeros((0,), np.float32)

    # per-listener fanout backlog cap: a stalled listener must not grow its
    # queue without bound while the producer keeps streaming
    MAX_QUEUED = 512

    def broadcast(self, data: bytes):
        for q in list(self.listeners):
            if q.qsize() >= self.MAX_QUEUED:
                q.get_nowait()  # drop oldest; the stream stays live
            q.put_nowait(data)


class MimiRooms:
    def __init__(self, state: MimiWsState, allowed=None,
                 default_room: str | None = None):
        self.state = state
        self.rooms: dict[str, MimiRoom] = {}
        # reference worker configs declare the room list up front
        # (main.rs:119 MimiConfig.rooms); unknown rooms are rejected there
        self.allowed = set(allowed) if allowed is not None else None
        self.default_room = default_room

    def room(self, room_id: str) -> MimiRoom:
        if self.allowed is not None and room_id not in self.allowed:
            raise KeyError(room_id)
        if room_id not in self.rooms:
            self.rooms[room_id] = MimiRoom(self.state)
        return self.rooms[room_id]


def _room_of(request, rooms: MimiRooms):
    """Room id from the URL (native /{room}/ routes), the `room_id` header
    (reference clients, main.rs:29 ROOM_ID_HEADER) or the configured
    default.  Returns None (-> 1008 close) for unknown/missing rooms."""
    rid = (request.match_info.get("room")
           or request.headers.get("room_id")
           or request.query.get("room_id")
           or rooms.default_room)
    if rid is None:
        return None
    try:
        return rooms.room(rid)
    except KeyError:
        return None


async def handle_room_send(request, rooms: MimiRooms):
    """Producer socket (mimi.rs send_socket): Text messages are forwarded
    verbatim; Codes messages (u32 LE, one or more frames of K codebooks)
    are streaming-decoded and broadcast as b"\\x01" audio in frame_size
    chunks."""
    from aiohttp import web, WSMsgType

    room = _room_of(request, rooms)
    ws = web.WebSocketResponse()
    if room is None:
        await ws.prepare(request)
        await ws.close(code=1008, message=b"unknown room")
        return ws
    await ws.prepare(request)
    if room.producer_active:
        await ws.close(code=1008, message=b"already a producer")
        return ws
    room.producer_active = True
    state = rooms.state
    K = state.mimi.num_codebooks
    fs = state.mimi.frame_size
    try:
        async for message in ws:
            if message.type != WSMsgType.BINARY or not message.data:
                continue
            kind = message.data[0]
            payload = message.data[1:]
            if kind == 2:          # Text: forward directly (mimi.rs:181-183)
                room.broadcast(bytes(message.data))
            elif kind == 9:        # Codes -> decode -> pcm chunks
                flat = np.frombuffer(payload[:len(payload) - len(payload) % 4],
                                     np.uint32).astype(np.int32)
                if flat.size == 0 or flat.size % K:
                    continue
                codes = flat.reshape(-1, K).T            # [K, n]
                pcm = state.decode_codes(room.sess, codes)
                room.pcm_pending = np.concatenate([room.pcm_pending, pcm])
                while room.pcm_pending.shape[-1] >= fs:
                    chunk = room.pcm_pending[:fs]
                    room.pcm_pending = room.pcm_pending[fs:]
                    data = room.writer.append_pcm(
                        np.ascontiguousarray(chunk, np.float32))
                    if data:
                        room.broadcast(b"\x01" + data)
    finally:
        room.producer_active = False
    return ws


async def handle_room_recv(request, rooms: MimiRooms):
    """Listener socket (mimi.rs recv_socket): 9-byte handshake, the room's
    ogg header, then the live broadcast."""
    import asyncio
    from aiohttp import web

    room = _room_of(request, rooms)
    ws = web.WebSocketResponse()
    if room is None:
        await ws.prepare(request)
        await ws.close(code=1008, message=b"unknown room")
        return ws
    await ws.prepare(request)
    q: asyncio.Queue = asyncio.Queue()
    room.listeners.add(q)
    try:
        await ws.send_bytes(b"\x00" + b"\x00" * 8)
        if room.header:
            await ws.send_bytes(b"\x01" + room.header)
        while True:
            data = await q.get()
            await ws.send_bytes(data)
    except (ConnectionResetError, asyncio.CancelledError):
        pass
    finally:
        room.listeners.discard(q)
        await ws.close()
    return ws
