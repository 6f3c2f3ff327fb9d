"""Web-client protocol state machine, twin-tested.

`client/protocol.js` holds the browser client's handshake / MT-dispatch /
reconnect logic as a pure module (no DOM, no WebSocket); JS cannot execute
in this environment, so `moshi_tpu/client_protocol.py` mirrors it
line-for-line and these tests drive the twin — unit-level and against the
REAL websocket server — the way ogg.py twins ogg.js for byte framing
(tests/test_ogg_framing.py).  Reference surface:
client/src/protocol/encoder.ts:1, rust/protocol.md:1-31.
"""

import asyncio
import json

import numpy as np
import pytest

from moshi_tpu.client_protocol import (MoshiProtocol, session_query, frame,
                                       MT, CTRL, SESSION_PARAM_DEFAULTS)
from test_server import tiny_checkpoint  # noqa: F401  (module fixture)


# ----------------------------------------------------------------- unit level

def test_session_query_omits_defaults():
    q = session_query(dict(SESSION_PARAM_DEFAULTS))
    assert q == "?resume_support=1"
    q = session_query({"text_temperature": "0.9", "audio_topk": "250"})
    assert q == "?text_temperature=0.9&resume_support=1"
    q = session_query({}, resume="abcd")
    assert q.endswith("resume_support=1&resume=abcd")


def test_handshake_dispatch_modes():
    # opus mode: audio comes up on MT 0 directly
    p = MoshiProtocol(opus_mode=True)
    assert p.onopen() == []
    acts = p.onmessage(bytes([MT["HANDSHAKE"]]) + b"\0" * 8)
    assert ("setup_audio",) in acts and ("controls", True) in acts
    # ogg-opus payloads are routed to the decoder
    acts = p.onmessage(bytes([MT["AUDIO"]]) + b"OggS...")
    assert acts == [("audio", b"OggS...")]

    # raw-pcm mode: MT 0 only acknowledges; audio comes up on the MT 4 echo
    p = MoshiProtocol(opus_mode=False)
    (kind, payload), = p.onopen()
    assert kind == "send" and payload[0] == MT["METADATA"]
    assert json.loads(payload[1:]) == {"raw_pcm": True,
                                       "client": "moshi_tpu-web"}
    acts = p.onmessage(bytes([MT["HANDSHAKE"]]) + b"\0" * 8)
    assert not any(a[0] == "setup_audio" for a in acts)
    acts = p.onmessage(frame(MT["METADATA"], json.dumps(
        {"raw_pcm": True, "sample_rate": 24000, "frame_size": 1920}).encode()))
    assert ("setup_audio",) in acts and ("controls", True) in acts
    # opus payloads BEFORE audio negotiation are dropped, not decoded
    p2 = MoshiProtocol(opus_mode=False)
    assert p2.onmessage(bytes([MT["AUDIO"]]) + b"x") == []


def test_message_parsing():
    p = MoshiProtocol(opus_mode=True)
    assert p.onmessage(b"") == []
    assert p.onmessage(bytes([MT["PING"]])) == []
    assert p.onmessage(bytes([42]) + b"junk") == []  # unknown MT discarded
    assert p.onmessage(frame(MT["TEXT"], "héllo".encode())) == \
        [("text", "héllo", None)]
    assert p.onmessage(frame(MT["COLOREDTEXT"], bytes([7]) + b"hi")) == \
        [("text", "hi", 7)]
    assert p.onmessage(frame(MT["COLOREDTEXT"], bytes([250]) + b"x")) == \
        [("text", "x", 10)]  # palette index clamped
    assert p.onmessage(frame(MT["ERROR"], b"boom")) == [("error", "boom")]
    acts = p.onmessage(frame(MT["METADATA"], json.dumps(
        {"status": "wait", "queue_position": 3}).encode()))
    assert ("queue", 3) in acts


def test_controls_encode():
    p = MoshiProtocol(opus_mode=True)
    assert p.pause()[0] == ("send", bytes([MT["CONTROL"], CTRL["PAUSE"]]))
    assert p.start()[0] == ("send", bytes([MT["CONTROL"], CTRL["START"]]))
    assert p.restart() == [("send", bytes([MT["CONTROL"], CTRL["RESTART"]]))]


def test_reconnect_budget():
    """Unexpected drop with a resume_id reconnects up to 3 times; producing
    sessions (audio/pcm received) refresh the budget; user-initiated
    disconnects never reconnect."""
    p = MoshiProtocol(opus_mode=True)
    # no resume_id: plain disconnect
    assert ("status", "disconnected") in p.onclose()

    p.onmessage(frame(MT["METADATA"], b'{"resume_id": "r1"}'))
    acts = p.onclose()
    assert ("reconnect", "r1", 300) in acts
    assert p.resume_id is None  # consumed

    # three consecutive silent reconnects exhaust the budget
    for i in range(2):
        p.onmessage(frame(MT["METADATA"], b'{"resume_id": "r2"}'))
        assert any(a[0] == "reconnect" for a in p.onclose())
    p.onmessage(frame(MT["METADATA"], b'{"resume_id": "r3"}'))
    assert not any(a[0] == "reconnect" for a in p.onclose())

    # audio refreshes the budget
    p.onmessage(frame(MT["METADATA"], b'{"resume_id": "r4"}'))
    p.audio_up = True
    p.onmessage(frame(MT["PCM"], b"\0" * 8))
    assert p.resume_tries == 0
    assert any(a[0] == "reconnect" for a in p.onclose())

    # user-closed: no reconnect even with a resume_id
    p.onmessage(frame(MT["METADATA"], b'{"resume_id": "r5"}'))
    p.disconnect()
    assert not any(a[0] == "reconnect" for a in p.onclose())


def test_resumed_and_restarted_metadata():
    p = MoshiProtocol(opus_mode=True)
    acts = p.onmessage(frame(MT["METADATA"], json.dumps(
        {"resume_id": "abc", "resumed": True}).encode()))
    assert ("resumed",) in acts and p.resume_id == "abc"
    acts = p.onmessage(frame(MT["METADATA"], b'{"event": "restarted"}'))
    assert ("transcript_clear",) in acts


def test_twin_matches_js_source():
    """Structural parity guard: every MT case and action kind emitted by the
    JS module must appear in the twin (and vice versa for actions)."""
    from pathlib import Path
    js = (Path(__file__).resolve().parent.parent / "client" /
          "protocol.js").read_text()
    py = (Path(__file__).resolve().parent.parent / "moshi_tpu" /
          "client_protocol.py").read_text()
    for name in ("HANDSHAKE", "AUDIO", "TEXT", "CONTROL", "METADATA",
                 "ERROR", "PING", "COLOREDTEXT", "PCM"):
        assert f"MT.{name}" in js or f'{name}:' in js
        assert f'MT["{name}"]' in py
    for action in ("send", "status", "setup_audio", "controls", "audio",
                   "pcm", "text", "session_info", "queue", "resumed",
                   "transcript_clear", "reconnect", "error"):
        assert f'"{action}"' in js, action
        assert f'"{action}"' in py or f"('{action}'" in py, action
    # index.html must actually load the module
    html = (Path(__file__).resolve().parent.parent / "client" /
            "index.html").read_text()
    assert 'src="protocol.js"' in html


# ------------------------------------------------- integration vs real server

class TwinDriver:
    """Host harness around the python twin: executes its actions against a
    real aiohttp websocket the way index.html executes them in a browser."""

    def __init__(self, ws, opus_mode=False):
        self.ws = ws
        self.p = MoshiProtocol(opus_mode=opus_mode)
        self.log = []

    async def open(self):
        await self._run(self.p.onopen())

    async def _run(self, acts):
        for a in acts:
            self.log.append(a)
            if a[0] == "send":
                await self.ws.send_bytes(a[1])

    async def pump(self, timeout=0.2):
        """Drain pending server frames into the twin."""
        import aiohttp
        while True:
            try:
                m = await asyncio.wait_for(self.ws.receive(), timeout=timeout)
            except asyncio.TimeoutError:
                return
            if m.type != aiohttp.WSMsgType.BINARY:
                return
            await self._run(self.p.onmessage(m.data))

    def kinds(self):
        return [a[0] for a in self.log]


@pytest.mark.parametrize("dummy", [0])
def test_twin_against_real_server(tiny_checkpoint, dummy):  # noqa: F811
    """Drive the twin against the real ws server: raw-pcm negotiation, MT 4
    config echo (resume_id), audio round-trip, pause/start, restart event,
    drop + resume reconnect — the full lifecycle index.html implements."""
    aiohttp = pytest.importorskip("aiohttp")
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState

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
            # --- session 1: negotiate, stream, pause, restart, drop
            q = session_query({"text_temperature": "0.65"})
            ws = await client.ws_connect("/api/chat" + q)
            d = TwinDriver(ws, opus_mode=False)
            await d.open()
            await d.pump()
            assert "setup_audio" in d.kinds(), d.log
            assert any(k == "session_info" for k in d.kinds()), d.log
            assert any("temp 0.65" in a[1] for a in d.log
                       if a[0] == "session_info")
            assert d.p.resume_id, "resume_support did not yield a resume_id"
            rid1 = d.p.resume_id

            got_pcm = 0
            for _ in range(10):
                pcm = (rs.randn(fs) * 0.05).astype(np.float32)
                await ws.send_bytes(frame(MT["PCM"], pcm.tobytes()))
                await d.pump(timeout=0.3)
                got_pcm = sum(1 for a in d.log if a[0] == "pcm")
                if got_pcm >= 2:
                    break
            assert got_pcm >= 2, d.kinds()

            await d._run(d.p.pause())
            await d._run(d.p.start())
            await d._run(d.p.restart())
            await d.pump(timeout=0.5)
            assert ("transcript_clear",) in d.log, d.kinds()

            # unexpected drop -> twin schedules a resume reconnect
            await ws.close()
            acts = d.p.onclose()
            rec = [a for a in acts if a[0] == "reconnect"]
            assert rec and rec[0][1] == rid1

            # --- session 2: reconnect with ?resume=, twin reports resumed
            q2 = session_query({}, resume=rec[0][1])
            ws2 = await client.ws_connect("/api/chat" + q2)
            d2 = TwinDriver(ws2, opus_mode=False)
            d2.p.resume_tries = d.p.resume_tries
            await d2.open()
            await d2.pump(timeout=0.5)
            assert ("resumed",) in d2.log, d2.log
            assert d2.p.resume_id and d2.p.resume_id != rid1
            await ws2.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_gradio_handler_protocol_bridge():
    """client_gradio.MoshiHandler's ws<->WebRTC bridging logic, executed
    with a fake socket (no gradio extras): mic int16 frames are framed as
    MT 10 raw pcm (or opus), incoming MT 1/2/10 messages become audio
    chunks and AdditionalOutputs text, the raw_pcm metadata grant flips the
    encoding."""
    from moshi_tpu import client_gradio as cg
    from moshi_tpu.serve import protocol as proto

    h = cg.MoshiHandler("http://example:8998")
    assert h.ws_url == "ws://example:8998/api/chat"

    class FakeWs:
        def __init__(self, incoming):
            self.sent = []
            self.incoming = list(incoming)

        def send(self, data):
            self.sent.append(bytes(data))

        def __iter__(self):
            return iter(self.incoming)

        def close(self):
            self.closed = True

    # ---- downlink: metadata grant, pcm audio, text
    pcm1 = (np.arange(1920, dtype=np.float32) / 4000.0).tobytes()
    pcm2 = (np.ones(960, np.float32) * 0.25).tobytes()
    h.ws = FakeWs([
        proto.msg(proto.MT_METADATA, json.dumps({"raw_pcm": True}).encode()),
        proto.msg(proto.MT_PCM, pcm1),
        proto.msg(proto.MT_TEXT, "hello".encode()),
        proto.msg(proto.MT_PCM, pcm2),   # buffered: under one frame
        proto.msg(proto.MT_PCM, pcm2),   # completes a frame
        b"",                              # keepalive -> None from emit
    ])
    out = h.emit()                        # first item after the metadata
    assert isinstance(out, tuple)
    sr, audio = out
    assert sr == 24000 and audio.shape == (1, 1920)
    np.testing.assert_array_equal(audio[0],
                                  np.frombuffer(pcm1, np.float32))
    assert h._raw_pcm is True             # grant recorded

    text = h.emit()
    assert isinstance(text, cg.AdditionalOutputs)
    assert text.args[0] == "hello"

    out2 = h.emit()                       # the two 960-sample halves
    assert out2[1].shape == (1, 1920)
    np.testing.assert_allclose(out2[1][0, :960], 0.25)
    assert h.emit() is None               # keepalive

    # ---- uplink: int16 mic frames -> MT 10 frames of exactly 1920 samples
    mic = (np.ones((1, 960), np.int16) * 16384)
    h.receive((24000, mic))
    assert h.ws.sent == []                # buffered: under one frame
    h.receive((24000, mic))
    assert len(h.ws.sent) == 1
    kind, payload = h.ws.sent[0][0], h.ws.sent[0][1:]
    assert kind == proto.MT_PCM
    sent = np.frombuffer(payload, np.float32)
    assert sent.shape == (1920,)
    np.testing.assert_allclose(sent, 0.5)

    # ---- reset clears stream state
    h.reset()
    assert h._pending_out.size == 0 and h._pending_in.size == 0
    assert h.copy().url == h.url

    # ---- opus fallback (no raw_pcm grant): mic frames produce MT 1 pages
    h2 = cg.MoshiHandler("https://example:8998")
    assert h2.ws_url == "wss://example:8998/api/chat"
    h2.ws = FakeWs([])
    big = (np.ones((1, 4096), np.int16) * 8192)
    h2.receive((24000, big))
    h2.receive((24000, big))
    assert h2.ws.sent, "opus writer produced no pages"
    assert all(m[0] == proto.MT_AUDIO for m in h2.ws.sent)
    # the pages decode back through the native reader
    from moshi_tpu import moshi_native
    rd = moshi_native.OpusStreamReader(24000)
    decoded = b"".join(rd.append_bytes(m[1:]) for m in h2.ws.sent)
    back = np.frombuffer(decoded, np.float32)
    assert back.size > 0  # opus priming delay eats the start; audio flows
