"""Hostile-input fuzzing across the serving surfaces (VERDICT r3 item 4).

The rust reference gets memory safety by construction (typed rmp_serde
decode, `moshi-server/src/protocol.rs:7-53`); this stack's hand-rolled
parsers — the native OggReader (lacing + CRC, native/moshi_native.cpp),
msgpack handling in serve/batched_asr.py, MT dispatch in serve/server.py,
the JSON TTS protocol, and the mimi codes service — are driven here with
random, truncated, corrupted, and oversized input.  Invariants asserted:
no parser crash ever kills a batch loop or the process, slots never leak,
concurrent well-behaved clients are unperturbed, and memory stays bounded
under adversarial streams.
"""

import asyncio
import json
import struct

import numpy as np
import pytest

from moshi_tpu import moshi_native
from moshi_tpu.ogg import ogg_crc, OggPageWriter, opus_head, opus_tags


def _valid_stream(n_frames=10, seed=0):
    w = moshi_native.OpusStreamWriter(24000)
    rs = np.random.RandomState(seed)
    out = b""
    for _ in range(n_frames):
        out += w.append_pcm((rs.randn(1920) * 0.1).astype(np.float32))
    return out


def _decoded_samples(reader, data: bytes) -> int:
    return len(reader.append_bytes(data)) // 4


# ------------------------------------------------------------- native ogg
def test_ogg_reader_random_garbage_then_resync():
    """Random bytes never crash the reader, and a valid stream fed AFTER
    arbitrary garbage still decodes (capture-pattern resync)."""
    rs = np.random.RandomState(42)
    r = moshi_native.OpusStreamReader(24000)
    for _ in range(200):
        n = int(rs.randint(1, 5000))
        r.append_bytes(rs.bytes(n))
    # adversarial: garbage that contains capture patterns + bogus headers
    for _ in range(50):
        blob = b"OggS" + rs.bytes(int(rs.randint(0, 400)))
        r.append_bytes(blob)
    got = _decoded_samples(r, _valid_stream())
    assert got > 0, "reader failed to resync after garbage"


def test_ogg_reader_bit_corruption():
    """Flipping any byte of a valid stream must not crash, and the CRC
    check must drop the corrupted page (decoded sample count can only
    shrink vs the clean stream)."""
    clean = _valid_stream(n_frames=6)
    r0 = moshi_native.OpusStreamReader(24000)
    n_clean = _decoded_samples(r0, clean)
    rs = np.random.RandomState(7)
    for _ in range(60):
        pos = int(rs.randint(0, len(clean)))
        bad = bytearray(clean)
        bad[pos] ^= 1 + int(rs.randint(0, 255))
        r = moshi_native.OpusStreamReader(24000)
        got = _decoded_samples(r, bytes(bad))
        assert got <= n_clean


def test_ogg_reader_truncation():
    """Every truncation point of a valid stream is survivable, and the
    reader keeps working when the remainder arrives later."""
    clean = _valid_stream(n_frames=4)
    r0 = moshi_native.OpusStreamReader(24000)
    n_clean = _decoded_samples(r0, clean)
    for cut in range(0, len(clean), 97):
        r = moshi_native.OpusStreamReader(24000)
        a = _decoded_samples(r, clean[:cut])
        b = _decoded_samples(r, clean[cut:])
        assert a + b == n_clean, f"split at {cut} lost samples"


def test_ogg_reader_dribble_equals_bulk():
    clean = _valid_stream(n_frames=5, seed=3)
    r_bulk = moshi_native.OpusStreamReader(24000)
    bulk = r_bulk.append_bytes(clean)
    r_drib = moshi_native.OpusStreamReader(24000)
    out = b""
    i = 0
    rs = np.random.RandomState(1)
    while i < len(clean):
        step = int(rs.randint(1, 8))
        out += r_drib.append_bytes(clean[i:i + step])
        i += step
    assert out == bulk


def _continuation_flood_page(pageno: int) -> bytes:
    """A syntactically-valid continuation page whose 255 lacing values
    never terminate a packet: feeds the reader's reassembly buffer
    forever without ever producing a packet."""
    body = b"\xAA" * (255 * 255)
    lacing = bytes([255] * 255)
    header = (b"OggS" + bytes([0, 0x01])        # version, continuation flag
              + struct.pack("<q", 0)
              + struct.pack("<I", 0x1234)
              + struct.pack("<I", pageno)
              + b"\x00\x00\x00\x00"
              + bytes([255]) + lacing)
    page = bytearray(header + body)
    page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
    return bytes(page)


def _vm_rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def test_ogg_reader_continuation_flood_memory_bounded():
    """A never-terminating continuation stream (all-255 lacing) must not
    grow the reassembly buffer without bound: ~64 MB of flood must not
    move RSS by more than a few MB (the reader caps packet reassembly at
    256 KB and drops the stream)."""
    r = moshi_native.OpusStreamReader(24000)
    page = _continuation_flood_page(0)  # same bytes each feed: CRC covers
    r.append_bytes(page)                # pageno, so keep pageno constant —
    before = _vm_rss_kb()               # the reader doesn't check sequence
    for _ in range(1000):               # ~65 MB total
        r.append_bytes(page)
    after = _vm_rss_kb()
    assert after - before < 30 * 1024, (
        f"RSS grew {after - before} KB under continuation flood")
    # the reader is still functional for a fresh valid stream
    assert _decoded_samples(r, _valid_stream()) > 0


def test_ogg_reader_hostile_headers():
    """Abusive OpusHead variants: giant pre-skip, truncated head, head-only
    stream — all survivable."""
    w = OggPageWriter()
    r = moshi_native.OpusStreamReader(24000)
    # pre-skip 65535 (~1.4 s of audio skipped at 48 kHz) — legal, absurd
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 65535)
            + struct.pack("<I", 24000) + struct.pack("<h", 0) + bytes([0]))
    r.append_bytes(w.page(head, 0, 0x02))
    r.append_bytes(w.page(opus_tags(), 0, 0))
    # truncated OpusHead (shorter than the pre-skip field)
    r2 = moshi_native.OpusStreamReader(24000)
    w2 = OggPageWriter()
    r2.append_bytes(w2.page(b"OpusHead" + bytes([1]), 0, 0x02))
    # empty packets, zero-length pages
    r3 = moshi_native.OpusStreamReader(24000)
    w3 = OggPageWriter()
    r3.append_bytes(w3.page(b"", 0, 0))
    r3.append_bytes(w3.page(opus_head(24000), 0, 0x02))
    assert _decoded_samples(r3, _valid_stream()) > 0


# ------------------------------------------------------------- mimi service
def test_mimi_ws_fuzz():
    """The codes service survives ragged/malformed payloads, and the
    fixed-shape per-frame stepping returns identical results regardless of
    client chunking (no recompile-DoS surface)."""
    pytest.importorskip("aiohttp")
    import jax
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    import aiohttp
    from test_mimi import tiny_mimi_config
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.serve.mimi_ws import MimiWsState, handle_mimi_socket

    mimi = MimiModel(tiny_mimi_config())
    params = mimi.init_params(jax.random.PRNGKey(0))
    state = MimiWsState(mimi, params)
    K = mimi.num_codebooks
    fs = mimi.frame_size

    async def run():
        app = web.Application()
        app.router.add_get("/api/mimi", lambda r: handle_mimi_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/mimi")
            rs = np.random.RandomState(0)
            # malformed payloads: ragged sizes, wrong multiples, empty,
            # unknown kinds — all silently survivable
            for blob in [b"\x01" + b"abc", b"\x09" + b"\x01\x02\x03",
                         b"\x09", b"\x01", b"\x07" + rs.bytes(64),
                         b"\x09" + rs.bytes(4 * (K + 1)),
                         b"\xff" + rs.bytes(1000)]:
                await ws.send_bytes(blob)
            # now a well-formed 3-frame encode still answers correctly —
            # and chunking must not matter (single compiled program)
            pcm = (rs.randn(3 * fs) * 0.1).astype(np.float32)
            await ws.send_bytes(b"\x01" + pcm.tobytes())
            m = await asyncio.wait_for(ws.receive(), timeout=30)
            assert m.type == aiohttp.WSMsgType.BINARY and m.data[0] == 9
            codes_bulk = np.frombuffer(m.data[1:], np.int32).reshape(K, -1)
            assert codes_bulk.shape == (K, 3)

            ws2 = await client.ws_connect("/api/mimi")
            got = []
            for i in range(3):
                await ws2.send_bytes(
                    b"\x01" + pcm[i * fs:(i + 1) * fs].tobytes())
                m = await asyncio.wait_for(ws2.receive(), timeout=30)
                got.append(np.frombuffer(m.data[1:], np.int32))
            assert (np.stack(got, -1) == codes_bulk).all()

            # decode round-trip after garbage, with an oversized code value
            bad_codes = np.full((K, 2), 10 ** 6, np.int32)
            await ws.send_bytes(b"\x09" + bad_codes.tobytes())
            m = await asyncio.wait_for(ws.receive(), timeout=30)
            assert m.data[0] == 1  # clamped gather still yields audio
            await ws.close()
            await ws2.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


# ------------------------------------------------------------- batched ASR
def test_batched_asr_fuzz_10k_and_isolation():
    """10k malformed messages into one slot while a well-behaved client
    streams on another: the batch loop never dies, the good client's
    Step/Marker flow is unperturbed, and both slots are released."""
    aiohttp = pytest.importorskip("aiohttp")
    msgpack = pytest.importorskip("msgpack")
    import jax
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.serve.batched_asr import BatchedAsrState, handle_asr_socket
    from test_asr_serving import _tiny_stt

    lm, lm_params, mimi, mimi_params = _tiny_stt(extra_heads=1)
    asr = StreamingASR(mimi, lm, batch_size=2, asr_delay_in_tokens=1,
                       temperature=0.0, text_tokenizer=None)
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))
    fs = mimi.frame_size

    malformed = [
        msgpack.packb(["not", "a", "map"]),
        msgpack.packb(17),
        msgpack.packb({"type": "Marker"}),                      # missing id
        msgpack.packb({"type": "Marker", "id": {"x": 1}}),      # bad id type
        msgpack.packb({"type": "Marker", "id": "nan"}),
        msgpack.packb({"type": "Audio"}),                       # missing pcm
        msgpack.packb({"type": "Audio", "pcm": "zzz"}),
        msgpack.packb({"type": "Audio", "pcm": [["a"]]}),
        msgpack.packb({"type": "Audio", "pcm": {"a": 1}}),
        msgpack.packb({"type": "OggOpus"}),
        msgpack.packb({"type": "OggOpus", "data": 5}),
        msgpack.packb({"type": "Nonsense"}),
        b"\x08" + b"abc",                                       # ragged f32
        b"\x01" + b"\xff" * 64,                                 # garbage opus
        b"\xc1",                                                # bad msgpack
        b"\x81",                                                # truncated map
    ]

    async def run():
        app = web.Application()
        app.router.add_get("/api/asr-streaming",
                           lambda r: handle_asr_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        loop_task = asyncio.create_task(state.run_loop())
        try:
            good = await client.ws_connect("/api/asr-streaming")
            assert msgpack.unpackb((await good.receive()).data)["type"] == "Ready"
            evil = await client.ws_connect("/api/asr-streaming")
            assert msgpack.unpackb((await evil.receive()).data)["type"] == "Ready"
            assert len(state.slots_free) == 0

            rs = np.random.RandomState(0)

            async def good_client():
                got = []
                await good.send_bytes(msgpack.packb({"type": "Marker", "id": 9}))
                for _ in range(8):
                    pcm = (rs.randn(fs) * 0.1).astype(np.float32)
                    await good.send_bytes(msgpack.packb(
                        {"type": "Audio", "pcm": pcm.tolist()}))
                deadline = asyncio.get_event_loop().time() + 90
                while asyncio.get_event_loop().time() < deadline:
                    try:
                        m = await asyncio.wait_for(good.receive(), timeout=0.5)
                    except asyncio.TimeoutError:
                        continue
                    if m.type == aiohttp.WSMsgType.BINARY:
                        got.append(msgpack.unpackb(m.data))
                        if any(e.get("type") == "Marker" for e in got):
                            break
                return got

            async def evil_client():
                for i in range(10_000):
                    await evil.send_bytes(malformed[i % len(malformed)])
                    if i % 500 == 0:
                        await asyncio.sleep(0)  # let the loop breathe
                # plus pure random binary
                for _ in range(200):
                    await evil.send_bytes(rs.bytes(int(rs.randint(1, 300))))

            got, _ = await asyncio.gather(good_client(), evil_client())
            kinds = [e["type"] for e in got]
            assert "Step" in kinds, "good client starved during fuzzing"
            assert {"type": "Marker", "id": 9} in got
            # batch loop is still alive
            assert not loop_task.done(), loop_task
            await good.close()
            await evil.close()
            await asyncio.sleep(0.05)
            assert len(state.slots_free) == 2, "slot leaked after fuzzing"
            # server still takes fresh sessions
            ws = await client.ws_connect("/api/asr-streaming")
            assert msgpack.unpackb((await ws.receive()).data)["type"] == "Ready"
            await ws.close()
        finally:
            loop_task.cancel()
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_batched_asr_backlog_cap():
    """A client flooding audio faster than real time hits the 30 s backlog
    cap: excess is dropped, an Error is sent once, the slot survives."""
    aiohttp = pytest.importorskip("aiohttp")
    msgpack = pytest.importorskip("msgpack")
    import jax
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.serve.batched_asr import BatchedAsrState, handle_asr_socket
    from test_asr_serving import _tiny_stt

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    asr = StreamingASR(mimi, lm, batch_size=1, asr_delay_in_tokens=1,
                       temperature=0.0, text_tokenizer=None)
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))
    state.MAX_BUFFERED_SECONDS = 0.05  # tiny cap for the test

    async def run():
        app = web.Application()
        app.router.add_get("/api/asr-streaming",
                           lambda r: handle_asr_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        # NOTE: no batch loop running — the backlog only grows
        try:
            ws = await client.ws_connect("/api/asr-streaming")
            await ws.receive()  # Ready
            pcm = np.zeros(mimi.sample_rate // 10, np.float32)  # 100 ms
            for _ in range(5):
                await ws.send_bytes(msgpack.packb(
                    {"type": "Audio", "pcm": pcm.tolist()}))
            m = await asyncio.wait_for(ws.receive(), timeout=10)
            out = msgpack.unpackb(m.data)
            assert out["type"] == "Error" and "backlog" in out["message"]
            cap = int(state.MAX_BUFFERED_SECONDS * mimi.sample_rate)
            assert state.slot_pcm[0].shape[-1] <= cap
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


# ---------------------------------------------------------------- duplex ws
def test_duplex_server_fuzz(tiny_checkpoint):
    """Random message types, truncated control frames, malformed metadata/
    image payloads, ragged raw-pcm — then a valid exchange still produces
    audio.  Mid-handshake disconnects must not leak the session lock."""
    aiohttp = pytest.importorskip("aiohttp")
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu.serve import protocol as proto

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, None,
                        **info.lm_gen_config)
    state.warmup()
    fs = mimi.frame_size

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        rs = np.random.RandomState(0)
        try:
            # -- mid-handshake disconnects: connect, read nothing, vanish
            for _ in range(5):
                ws = await client.ws_connect("/api/chat")
                await ws.close()
            assert not state.lock.locked(), "session lock leaked"

            ws = await client.ws_connect("/api/chat")
            assert (await ws.receive_bytes())[:1] == b"\x00"
            # negotiate raw-pcm so the audio path needs no opus client-side
            await ws.send_bytes(bytes([proto.MT_METADATA])
                                + b'{"raw_pcm": true}')
            fuzz = [
                bytes([proto.MT_CONTROL]),                  # truncated
                bytes([proto.MT_CONTROL, 99]),              # unknown ctrl
                bytes([proto.MT_METADATA]) + b"{not json",
                bytes([proto.MT_METADATA]) + b"\xff\xfe",
                bytes([proto.MT_METADATA]) + b"[1,2,3]",
                bytes([proto.MT_IMAGE]) + b"\x01",          # truncated dims
                bytes([proto.MT_IMAGE]) + struct.pack("<II", 2 ** 31, 2 ** 31),
                bytes([proto.MT_IMAGE]) + struct.pack("<II", 4, 4) + b"xy",
                bytes([proto.MT_PCM]) + b"abc",             # ragged f32
                bytes([42]) + rs.bytes(100),                # unknown MT
                bytes([proto.MT_AUDIO]) + rs.bytes(500),    # garbage opus
            ]
            for blob in fuzz:
                await ws.send_bytes(blob)
            for _ in range(30):
                await ws.send_bytes(bytes([int(rs.randint(0, 256))])
                                    + rs.bytes(int(rs.randint(0, 200))))
            # drain whatever the server replied (metadata acks / errors)
            while True:
                try:
                    await asyncio.wait_for(ws.receive(), timeout=0.2)
                except asyncio.TimeoutError:
                    break
            # the session still works: valid raw-pcm frames produce audio
            audio = 0
            for i in range(8):
                pcm = (rs.randn(fs) * 0.05).astype(np.float32)
                await ws.send_bytes(bytes([proto.MT_PCM]) + pcm.tobytes())
                while True:
                    try:
                        m = await asyncio.wait_for(ws.receive(), timeout=0.2)
                    except asyncio.TimeoutError:
                        break
                    if (m.type == aiohttp.WSMsgType.BINARY
                            and m.data[:1] == bytes([proto.MT_PCM])):
                        audio += 1
            assert audio > 0, "no audio after fuzzing"
            await ws.close()
            await asyncio.sleep(0.05)
            assert not state.lock.locked(), "session lock leaked after fuzz"
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


# ------------------------------------------------------------ streaming TTS
def test_tts_ws_malformed_and_disconnect():
    """Malformed JSON / missing fields earn an Error but don't kill the
    session; a client that crashes the old receiver path (bad message +
    disconnect without Eos) must not leave the generation loop spinning."""
    aiohttp = pytest.importorskip("aiohttp")
    import jax
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.tts_ws import TTSStreamer, handle_tts_socket
    from test_serving_extra import _tiny_tts

    tts, lm_params, mimi_params = _tiny_tts()
    streamers = []

    def make_streamer():
        s = TTSStreamer(tts, lm_params, mimi_params, jax.random.PRNGKey(0))
        streamers.append(s)
        return s

    async def run():
        done_events = []

        async def handler(r):
            ev = asyncio.Event()
            done_events.append(ev)
            try:
                return await handle_tts_socket(r, make_streamer)
            finally:
                ev.set()

        app = web.Application()
        app.router.add_get("/api/tts_streaming", handler)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/tts_streaming")
            assert json.loads((await ws.receive()).data)["type"] == "Ready"
            bad = ["{not json", "[1,2]", "17",
                   json.dumps({"type": "Text"}),
                   json.dumps({"type": "Voice", "embeddings": "x",
                               "shape": [10 ** 9]}),
                   json.dumps({"type": "Voice"})]
            errors = 0
            for b in bad:
                await ws.send_str(b)
            # valid words after the garbage still synthesize to Eos
            await ws.send_str(json.dumps({"type": "Text", "text": "hello"}))
            await ws.send_str(json.dumps({"type": "Eos"}))
            got_eos = False
            deadline = asyncio.get_event_loop().time() + 120
            while asyncio.get_event_loop().time() < deadline:
                try:
                    m = await asyncio.wait_for(ws.receive(), timeout=1.0)
                except asyncio.TimeoutError:
                    continue
                if m.type == aiohttp.WSMsgType.TEXT:
                    e = json.loads(m.data)
                    if e.get("type") == "Error":
                        errors += 1
                    if e.get("type") == "Eos":
                        got_eos = True
                        break
                elif m.type in (aiohttp.WSMsgType.CLOSE,
                                aiohttp.WSMsgType.CLOSED):
                    break
            assert errors >= 4, f"expected Error replies, got {errors}"
            assert got_eos, "session died before Eos"
            await ws.close()

            # -- crash-the-receiver then vanish: the handler must terminate
            # (disconnect treated as EOS) instead of spinning forever
            ws2 = await client.ws_connect("/api/tts_streaming")
            await ws2.receive()  # Ready
            await ws2.send_str("{definitely not json")
            await ws2.close()
            try:
                await asyncio.wait_for(done_events[-1].wait(), timeout=60)
            except asyncio.TimeoutError:
                raise AssertionError(
                    "tts handler still running after client disconnect")
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_decode_out_of_range_codes_stays_finite():
    """Codes >= bins (hostile client on mimi_ws, or an LM whose audio card
    exceeds the codec bins) must clamp, not NaN: jnp.take's default fill
    mode writes NaN for out-of-bounds gathers, which permanently poisons
    the streaming decode state (found live in the round-4 verify drive)."""
    import jax
    import jax.numpy as jnp
    from test_mimi import tiny_mimi_config

    from moshi_tpu.models.mimi import MimiModel

    cfg = tiny_mimi_config()
    model = MimiModel(cfg)
    bins = cfg.quantizer.bins
    for dtype in (jnp.float32, jnp.bfloat16):
        params = model.init_params(jax.random.PRNGKey(0), dtype)
        state = model.init_decode_state(2, dtype)
        step = jax.jit(model.decode_step)
        rs = np.random.RandomState(0)
        for i in range(4):
            codes = jnp.asarray(
                rs.randint(0, bins + 40, (2, cfg.num_codebooks, 1)), jnp.int32)
            pcm, state = step(params, state, codes)
            assert np.isfinite(np.asarray(pcm)).all(), (dtype, i)


# fixture import (module-scoped tiny checkpoint built from the reference)
from test_server import tiny_checkpoint  # noqa: F401, E402
