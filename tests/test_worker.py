"""Multi-module worker server: module construction from TOML config and a
mimi-module websocket roundtrip (encode -> codes -> decode)."""

import asyncio
import json

import numpy as np
import pytest

from test_server import tiny_checkpoint  # noqa: F401 (fixture)


def test_worker_builds_modules(tiny_checkpoint):
    import tomllib
    from moshi_tpu.serve.worker import build_module

    toml = f"""
authorized_ids = ["secret"]

[modules.chat]
type = "moshi"
route = "/api/chat"
checkpoint_dir = "{tiny_checkpoint}"

[modules.mimi]
type = "mimi"
route = "/api/mimi"
checkpoint_dir = "{tiny_checkpoint}"
"""
    cfg = tomllib.loads(toml)
    assert cfg["authorized_ids"] == ["secret"]
    infos = {}
    for i, (name, mcfg) in enumerate(cfg["modules"].items()):
        route, handler, startup, minfo = build_module(name, mcfg, seed=i)
        infos[name] = (route, minfo)
    assert infos["chat"][0] == "/api/chat"
    assert infos["mimi"][1]["type"] == "mimi"


def test_mimi_ws_module_roundtrip(tiny_checkpoint):
    aiohttp = pytest.importorskip("aiohttp")
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.mimi_ws import MimiWsState, handle_mimi_socket

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    state = MimiWsState(mimi, mimi_params)
    K = mimi.num_codebooks
    fs = mimi.frame_size

    async def run():
        app = web.Application()
        app.router.add_get("/api/mimi", lambda r: handle_mimi_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/mimi")
            pcm = (np.random.RandomState(0).randn(2 * fs) * 0.1).astype(np.float32)
            await ws.send_bytes(b"\x01" + pcm.tobytes())
            msg = await ws.receive_bytes()
            assert msg[0] == 9
            codes = np.frombuffer(msg[1:], np.int32).reshape(K, -1)
            assert codes.shape[1] == 2
            await ws.send_bytes(b"\x09" + codes.astype(np.int32).tobytes())
            msg = await ws.receive_bytes()
            assert msg[0] == 1
            audio = np.frombuffer(msg[1:], np.float32)
            assert audio.size == 2 * fs
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_py_module_plugin(tmp_path):
    """User-extensible `py` / `py_post` modules (the analog of moshi-server's
    pyo3 py_module, py_module.rs:399-441): a user script's init() builds an
    app whose handlers are mounted on the configured route, with config
    pass-through, optional warmup and background run_loop."""
    aiohttp = pytest.importorskip("aiohttp")
    import tomllib
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.worker import build_module

    script = tmp_path / "plugin.py"
    script.write_text(
        """
import asyncio
import json
from aiohttp import web

class App:
    def __init__(self, batch_size, config):
        self.batch_size = batch_size
        self.config = config
        self.warmed = False
        self.loop_ticks = 0

    def warmup(self):
        self.warmed = True

    async def run_loop(self):
        while True:
            self.loop_ticks += 1
            await asyncio.sleep(0.01)

    async def handle(self, request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        await ws.send_json({"greeting": self.config["greeting"],
                            "batch_size": self.batch_size,
                            "warmed": self.warmed})
        await ws.close()
        return ws

    async def handle_post(self, request):
        body = await request.json()
        return web.json_response({"echo": body, "ticks": self.loop_ticks})

def init(batch_size, config):
    return App(batch_size, config)
"""
    )
    toml = f"""
[modules.custom]
type = "py"
route = "/api/custom"
script = "{script}"
batch_size = 4
[modules.custom.config]
greeting = "hi"

[modules.custom_post]
type = "py_post"
route = "/api/custom-post"
script = "{script}"
"""
    cfg = tomllib.loads(toml)
    built = {name: build_module(name, mcfg, seed=i)
             for i, (name, mcfg) in enumerate(cfg["modules"].items())}
    route, handler, startup, minfo = built["custom"]
    assert route == "/api/custom" and minfo["type"] == "py"
    proute, phandler, pstartup, pminfo = built["custom_post"]
    assert pminfo["type"] == "py_post"

    async def run():
        app = web.Application()
        app.router.add_get(route, handler)
        app.router.add_post(proute, phandler)
        client = TestClient(TestServer(app))
        await client.start_server()
        task = await startup() if startup is not None else None
        ptask = await pstartup() if pstartup is not None else None
        try:
            ws = await client.ws_connect("/api/custom")
            msg = await ws.receive_json()
            assert msg == {"greeting": "hi", "batch_size": 4, "warmed": True}
            await ws.close()
            resp = await client.post("/api/custom-post", json={"x": 1})
            body = await resp.json()
            assert body["echo"] == {"x": 1}
            await asyncio.sleep(0.05)
            resp = await client.post("/api/custom-post", json={"x": 2})
            body = await resp.json()
            assert body["ticks"] > 0, "run_loop was not scheduled"
        finally:
            for t in (task, ptask):
                if t is not None:
                    t.cancel()
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_mimi_broadcast_room():
    """Mimi broadcast rooms (moshi-server mimi.rs): one producer streams
    codes + text; two listeners both receive the handshake, the text
    forward, and decoded audio."""
    aiohttp = pytest.importorskip("aiohttp")
    from aiohttp import web, WSMsgType
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.mimi_ws import (MimiWsState, MimiRooms,
                                         handle_room_send, handle_room_recv)

    from test_mimi import tiny_mimi_config
    from moshi_tpu.models.mimi import MimiModel
    import jax
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(0))
    state = MimiWsState(mimi, mimi_params)
    rooms = MimiRooms(state)
    K = mimi.num_codebooks

    async def listener(client, got):
        ws = await client.ws_connect("/api/mimi/r1/recv")
        hs = await ws.receive_bytes()
        assert hs[0] == 0 and len(hs) == 9
        while True:
            try:
                m = await asyncio.wait_for(ws.receive(), timeout=5)
            except asyncio.TimeoutError:
                break
            if m.type != aiohttp.WSMsgType.BINARY:
                break
            got.append(bytes(m.data))
            if sum(1 for g in got if g[0] == 1) >= 2 and \
               any(g[0] == 2 for g in got):
                break
        await ws.close()

    async def run():
        app = web.Application()
        app.router.add_get("/api/mimi/{room}/send",
                           lambda r: handle_room_send(r, rooms))
        app.router.add_get("/api/mimi/{room}/recv",
                           lambda r: handle_room_recv(r, rooms))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            got1, got2 = [], []
            t1 = asyncio.create_task(listener(client, got1))
            t2 = asyncio.create_task(listener(client, got2))
            await asyncio.sleep(0.1)
            send = await client.ws_connect("/api/mimi/r1/send")
            # a second producer must be rejected
            dup = await client.ws_connect("/api/mimi/r1/send")
            m = await dup.receive()
            assert m.type in (WSMsgType.CLOSE, WSMsgType.CLOSED)
            await send.send_bytes(b"\x02hello")
            rs = np.random.RandomState(0)
            for _ in range(10):
                codes = rs.randint(0, 16, size=(K,), dtype=np.uint32)
                await send.send_bytes(b"\x09" + codes.tobytes())
                await asyncio.sleep(0.01)
            await asyncio.gather(t1, t2)
            for got in (got1, got2):
                kinds = [g[0] for g in got]
                assert 2 in kinds, "text not forwarded"
                assert kinds.count(1) >= 1, "no audio broadcast"
            await send.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_stream_tokenizer_threads():
    """StreamTokenizer (rustymimi analog): background-thread encode/decode
    round-trip matches the synchronous streaming Tokenizer exactly."""
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from test_lm import tiny_lm_config  # noqa: F401 (sys.path side effect)
    from test_mimi import tiny_mimi_config
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.serve.mimi_ws import Tokenizer, StreamTokenizer

    mimi = MimiModel(tiny_mimi_config())
    params = mimi.init_params(jax.random.PRNGKey(0))
    sync = Tokenizer(mimi, params)
    stream = StreamTokenizer(mimi, params)

    fs = mimi.frame_size
    rs = np.random.RandomState(0)
    chunks = [(rs.randn(fs) * 0.1).astype(np.float32) for _ in range(3)]

    # threaded encode == synchronous streaming encode, order preserved
    for c in chunks:
        stream.encode(c)
    got = []
    deadline = time.time() + 60
    while len(got) < 3 and time.time() < deadline:
        out = stream.get_encoded()
        if out is None:
            time.sleep(0.01)
            continue
        got.append(out)
    assert len(got) == 3
    for c, codes in zip(chunks, got):
        ref = sync.encode_step(c[None, None])[0]
        np.testing.assert_array_equal(codes, ref)

    # threaded decode round-trip
    stream.decode(got[0])
    deadline = time.time() + 60
    pcm = None
    while pcm is None and time.time() < deadline:
        pcm = stream.get_decoded()
        if pcm is None:
            time.sleep(0.01)
    assert pcm is not None and pcm.shape == (fs,)
    ref_pcm = sync.decode_step(got[0][None])[0, 0]
    np.testing.assert_array_equal(pcm, ref_pcm)
    assert stream.get_decoded() is None  # non-blocking empty poll
    stream.close()


def test_worker_graceful_drain(tmp_path):
    """build_app's drain: authed POST /api/drain flips the worker into
    draining — module routes answer 503 while /metrics and /api/* stay up —
    and the idle watcher fires the shutdown signal."""
    pytest.importorskip("aiohttp")
    import asyncio
    import signal as _signal
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.worker import build_app

    script = tmp_path / "plugin.py"
    script.write_text(
        "from aiohttp import web\n"
        "class App:\n"
        "    def __init__(self, b, c): pass\n"
        "    async def handle(self, request):\n"
        "        return web.Response(text='hi')\n"
        "def init(b, c):\n"
        "    return App(b, c)\n")
    cfg = {"authorized_ids": ["tok"],
           "modules": {"p": {"type": "py", "route": "/api/custom",
                             "script": str(script)}}}
    app = build_app(cfg, drain_timeout=30.0)
    # the open_channels gauge is process-global; earlier tests may leave
    # unreleased slots behind — the drain watcher must see an idle worker
    from moshi_tpu.serve.metrics import OPEN_CHANNELS
    OPEN_CHANNELS.set(0)

    fired = []
    orig = _signal.raise_signal

    async def run():
        _signal.raise_signal = lambda sig: fired.append(sig)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            hdr = {"kyutai-api-key": "tok"}
            r = await client.get("/api/custom", headers=hdr)
            assert r.status == 200

            # drain requires auth
            r = await client.post("/api/drain")
            assert r.status == 401
            r = await client.post("/api/drain", headers=hdr)
            assert (await r.json())["draining"] is True

            # module routes refuse new sessions; observability stays up
            r = await client.get("/api/custom", headers=hdr)
            assert r.status == 503
            r = await client.get("/metrics")
            assert r.status == 200
            r = await client.get("/api/modules_info", headers=hdr)
            assert r.status == 200

            # idle (open_channels == 0): the watcher fires the shutdown
            for _ in range(100):
                if fired:
                    break
                await asyncio.sleep(0.05)
            assert fired == [_signal.SIGINT]
        finally:
            _signal.raise_signal = orig
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


# --------------------------------------------------------------------------
# Drop-in support for reference moshi-server TOML configs (main.rs:154-277)
# --------------------------------------------------------------------------

def test_rust_inline_model_config_translation():
    """The inline rust model-config schema (s2st-1b.toml shape: top-level
    vocab sizes + [transformer] + [depformer] + [conditioners.*]) maps onto
    LmConfig exactly as lm.rs's own preset constructors do."""
    import tomllib
    from moshi_tpu.serve.toml_compat import translate_module
    from moshi_tpu.models.lm import LmConfig

    # structurally the reference rust/s2st-1b.toml (values per lm.rs
    # s2s_v0_1 / main.rs:211-277 parsing)
    model_toml = """
text_in_vocab_size = 48001
text_out_vocab_size = 48000
audio_vocab_size = 2049
audio_codebooks = 16

[transformer]
d_model = 2048
num_heads = 16
num_layers = 16
dim_feedforward = 8192
causal = true
norm_first = true
bias_ff = false
bias_attn = false
context = 3000
max_period = 100000
use_conv_block = false
use_conv_bias = true
gating = "silu"
norm = "RmsNorm"
positional_embedding = "Rope"
conv_layout = false
conv_kernel_size = 3
kv_repeat = 1
max_seq_len = 4096

[depformer]
num_slices = 8

[depformer.transformer]
d_model = 1024
num_heads = 16
num_layers = 6
dim_feedforward = 4096
causal = true
context = 8
max_period = 10000
gating = "silu"
norm = "RmsNorm"
positional_embedding = "None"
kv_repeat = 1
max_seq_len = 4096

[conditioners.description]
type = "Lut"
n_bins = 31
dim = 16
possible_values = ["very_bad", "bad", "neutral", "good", "very_good"]
"""
    m = {"type": "Lm", "path": "/api/chat",
         "lm_model_file": "model.safetensors",
         "text_tokenizer_file": "tok.model",
         "audio_tokenizer_file": "mimi.safetensors",
         "model": tomllib.loads(model_toml),
         "gen": {"generated_audio_codebooks": 8, "input_audio_codebooks": 8,
                 "audio_vocab_size": 2049, "acoustic_delay": 2,
                 "text_pad_token": 3, "text_eop_token": 0,
                 "text_start_token": 48000}}
    out = translate_module("chat", m)
    assert out["type"] == "moshi" and out["route"] == "/api/chat"
    cfg = out["_inline"]["config"]
    lc = LmConfig.from_dict(cfg)
    assert (lc.dim, lc.num_heads, lc.num_layers) == (2048, 16, 16)
    assert lc.hidden_scale == 4.0
    assert (lc.card, lc.text_card, lc.text_card_out) == (2048, 48000, None)
    assert (lc.n_q, lc.dep_q) == (16, 8)
    assert lc.norm == "rms_norm_f32" and lc.positional_embedding == "rope"
    assert lc.context == 3000 and lc.max_period == 100000.0
    assert (lc.depformer_dim, lc.depformer_num_layers) == (1024, 6)
    assert lc.depformer_dim_feedforward == 4096
    assert lc.depformer_pos_emb == "none"
    # delays from gen.acoustic_delay (lm_generate_multistream semantics)
    assert lc.delays == (0, 0, 2, 2, 2, 2, 2, 2, 2, 0, 2, 2, 2, 2, 2, 2, 2)
    assert lc.existing_text_padding_id == 3
    # conditioners translate to the config.json block
    assert cfg["conditioners"]["description"]["type"] == "lut"
    assert cfg["conditioners"]["description"]["lut"]["n_bins"] == 31


def test_worker_reference_toml_drop_in(tiny_checkpoint):
    """A verbatim reference-schema worker TOML (type = "BatchedAsr", `path`,
    explicit model files, inline [modules.X.model]) boots and serves the
    msgpack ASR protocol — MIGRATION.md's drop-in promise, tested."""
    pytest.importorskip("aiohttp")
    msgpack = pytest.importorskip("msgpack")
    import aiohttp
    import tomllib
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.worker import build_app
    from test_lm import tiny_lm_config

    c = tiny_lm_config()
    # the tiny checkpoint's architecture, spelled in the rust inline schema
    toml = f"""
static_dir = "/nonexistent"
log_dir = "/tmp/worker-logs"
instance_name = "tpu-worker"
authorized_ids = []

[modules.asr]
type = "BatchedAsr"
path = "/api/asr-streaming"
lm_model_file = "{tiny_checkpoint}/model.safetensors"
text_tokenizer_file = "{tiny_checkpoint}/tokenizer_spm_32k_3.model"
audio_tokenizer_file = "{tiny_checkpoint}/mimi.safetensors"
asr_delay_in_tokens = 2
batch_size = 2
temperature = 1.0

[modules.asr.model]
text_in_vocab_size = {c.text_card + 1}
text_out_vocab_size = {c.text_card}
audio_vocab_size = {c.card + 1}
audio_codebooks = {c.n_q}

[modules.asr.model.transformer]
d_model = {c.dim}
num_heads = {c.num_heads}
num_layers = {c.num_layers}
dim_feedforward = {int(c.hidden_scale * c.dim)}
causal = true
norm_first = true
bias_ff = false
bias_attn = false
context = {c.context}
max_period = 10000
use_conv_block = false
use_conv_bias = true
gating = "silu"
norm = "RmsNorm"
positional_embedding = "Rope"
conv_layout = false
conv_kernel_size = 3
kv_repeat = 1
max_seq_len = 4096

[modules.asr.model.depformer]
num_slices = {c.dep_q}

[modules.asr.model.depformer.transformer]
d_model = {c.depformer_dim}
num_heads = {c.depformer_num_heads}
num_layers = {c.depformer_num_layers}
dim_feedforward = {c.depformer_dim_feedforward}
causal = true
context = {c.dep_q}
max_period = 10000
gating = "silu"
norm = "RmsNorm"
positional_embedding = "None"
kv_repeat = 1
max_seq_len = 4096
"""
    # mimi config: the checkpoint dir's mimi_config.json is not referenced
    # by the rust schema; the worker must find the architecture from the
    # safetensors-adjacent file or the default.  The tiny mimi is NOT the
    # default config, so this also exercises sidecar config discovery.
    cfg = tomllib.loads(toml)

    async def run():
        app = build_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/api/modules_info")
            info = await r.json()
            assert info["asr"]["type"] == "batched_asr"
            assert info["asr"]["batch_size"] == 2

            ws = await client.ws_connect("/api/asr-streaming")
            msg = await ws.receive()
            assert msgpack.unpackb(msg.data) == {"type": "Ready"}
            rs = np.random.RandomState(0)
            got = []
            await ws.send_bytes(msgpack.packb({"type": "Marker", "id": 5}))
            deadline = asyncio.get_event_loop().time() + 120
            while asyncio.get_event_loop().time() < deadline:
                pcm = (rs.randn(1920) * 0.1).astype(np.float32)
                await ws.send_bytes(msgpack.packb(
                    {"type": "Audio", "pcm": pcm.tolist()}))
                try:
                    m = await asyncio.wait_for(ws.receive(), timeout=0.3)
                    if m.type == aiohttp.WSMsgType.BINARY:
                        got.append(msgpack.unpackb(m.data))
                except asyncio.TimeoutError:
                    pass
                kinds = {e["type"] for e in got}
                if "Word" in kinds and {"type": "Marker", "id": 5} in got:
                    break
            await ws.close()
            kinds = {e["type"] for e in got}
            assert "Word" in kinds, got[:5]
            assert {"type": "Marker", "id": 5} in got
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_py_batched_asr_module(tmp_path):
    """The PyBatchedAsr module type (py_basr_module.rs): a user script
    speaking the bitmask step protocol (updates NODATA/ACTIVE/RESET/marker,
    flags ACTIVE/MARKER_RECEIVED/EOS) is served over the msgpack ASR wire
    protocol — words assembled server-side from the token stream, markers
    aligned past the asr delay."""
    pytest.importorskip("aiohttp")
    msgpack = pytest.importorskip("msgpack")
    import aiohttp
    import tomllib
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.worker import build_app

    script = tmp_path / "toy_basr.py"
    script.write_text(
        "import numpy as np\n"
        "class App:\n"
        "    def __init__(self, batch_size, config):\n"
        "        assert config.get('greeting') == 'hi'\n"
        "        self.steps = np.zeros(batch_size, np.int64)\n"
        "        self.active = np.zeros(batch_size, bool)\n"
        "        self.warmed = False\n"
        "    def warmup(self):\n"
        "        self.warmed = True\n"
        "    def step(self, pcm, flags, tokens, extra, updates):\n"
        "        assert self.warmed\n"
        "        for i, u in enumerate(updates):\n"
        "            flags[i] = 0\n"
        "            if u == -2:\n"
        "                self.steps[i] = 0; self.active[i] = True\n"
        "                flags[i] = 1\n"
        "            elif u == -1:\n"
        "                self.active[i] = True; flags[i] = 1\n"
        "            elif u > 0:\n"
        "                flags[i] = 2\n"
        "            elif u == 0:\n"
        "                self.active[i] = False\n"
        "            if flags[i] & 3:\n"
        "                self.steps[i] += 1\n"
        "                # a 3-token word then a pad every 4th step\n"
        "                tokens[i] = 3 if self.steps[i] % 4 == 0 \\\n"
        "                    else 4 + (self.steps[i] % 3)\n"
        "                extra[i, :] = float(self.steps[i] % 2)\n"
        "def init(batch_size, config):\n"
        "    return App(batch_size, config)\n")

    toml = f"""
authorized_ids = []

[modules.pyasr]
type = "PyBatchedAsr"
path = "/api/py-asr"
script = "{script}"
batch_size = 2
text_tokenizer_file = "/nonexistent/tok.model"
asr_delay_in_tokens = 2

[modules.pyasr.py]
greeting = "hi"
"""
    cfg = tomllib.loads(toml)

    async def run():
        app = build_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/api/modules_info")
            info = await r.json()
            assert info["pyasr"]["type"] == "py_batched_asr"

            ws = await client.ws_connect("/api/py-asr")
            msg = await ws.receive()
            assert msgpack.unpackb(msg.data) == {"type": "Ready"}
            got = []
            await ws.send_bytes(msgpack.packb({"type": "Marker", "id": 9}))
            deadline = asyncio.get_event_loop().time() + 30
            while asyncio.get_event_loop().time() < deadline:
                pcm = np.zeros(1920, np.float32)
                await ws.send_bytes(msgpack.packb(
                    {"type": "Audio", "pcm": pcm.tolist()}))
                try:
                    m = await asyncio.wait_for(ws.receive(), timeout=0.2)
                    if m.type == aiohttp.WSMsgType.BINARY:
                        got.append(msgpack.unpackb(m.data))
                except asyncio.TimeoutError:
                    pass
                kinds = {e["type"] for e in got}
                if {"Word", "EndWord", "Step"} <= kinds \
                        and {"type": "Marker", "id": 9} in got:
                    break
            await ws.close()
            kinds = {e["type"] for e in got}
            assert {"Word", "EndWord", "Step"} <= kinds, kinds
            assert {"type": "Marker", "id": 9} in got
            # word timing from the per-slot step clock (steps/12.5)
            w = next(e for e in got if e["type"] == "Word")
            e = next(e for e in got if e["type"] == "EndWord")
            assert e["stop_time"] > w["start_time"] >= 0
            steps = [e for e in got if e["type"] == "Step"]
            assert all(len(e["prs"]) == 4 for e in steps)
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
