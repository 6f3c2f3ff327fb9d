"""End-to-end serving test: write a tiny checkpoint in the reference on-disk
format (config.json + safetensors from actual reference torch modules), load
it through CheckpointInfo, run the websocket server, and talk the binary
ogg-opus protocol to it."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    from refutil import import_reference
    import_reference()
    from moshi.modules import SEANetEncoder, SEANetDecoder
    from moshi.modules import transformer as ref_transformer
    from moshi.quantization import SplitResidualVectorQuantizer
    from moshi.models import compression as ref_compression
    from test_lm import tiny_lm_config, _build_reference_lm

    root = tmp_path_factory.mktemp("ckpt")

    # ---- tiny Mimi at 24 kHz (hop 24 -> encoder 1000 Hz -> stride 80)
    sn = dict(channels=1, dimension=32, causal=True, n_filters=4,
              n_residual_layers=1, activation="ELU", compress=2, dilation_base=2,
              disable_norm_outer_blocks=0, kernel_size=7, residual_kernel_size=3,
              last_kernel_size=3, norm="none", pad_mode="constant",
              ratios=[4, 3, 2], true_skip=True)
    trk = dict(d_model=32, num_heads=2, num_layers=1, causal=True, layer_scale=0.01,
               context=25, conv_layout=True, max_period=10000, gating="none",
               norm="layer_norm", positional_embedding="rope", dim_feedforward=64,
               input_dimension=32, output_dimensions=[32])
    qk = dict(dimension=16, n_q=4, bins=32, input_dimension=32, output_dimension=32)
    torch.manual_seed(0)
    quantizer = SplitResidualVectorQuantizer(**qk)
    with torch.no_grad():
        for rvq in (quantizer.rvq_first, quantizer.rvq_rest):
            for layer in rvq.vq.layers:
                cb = layer._codebook
                cb.embedding_sum.normal_()
                cb.cluster_usage.uniform_(0.5, 2.0)
                cb._initialized.fill_(1)
    rmimi = ref_compression.MimiModel(
        SEANetEncoder(**sn), SEANetDecoder(**sn), quantizer, channels=1,
        sample_rate=24000, frame_rate=12.5, encoder_frame_rate=1000, causal=True,
        resample_method="conv",
        encoder_transformer=ref_transformer.ProjectedTransformer(**trk),
        decoder_transformer=ref_transformer.ProjectedTransformer(**trk)).eval()
    save_file(rmimi.state_dict(), str(root / "mimi.safetensors"))
    mimi_config = dict(sample_rate=24000, channels=1, frame_rate=12.5,
                       seanet={k: v for k, v in sn.items()
                               if k not in ("activation", "causal", "norm",
                                            "disable_norm_outer_blocks", "true_skip")},
                       transformer=dict(d_model=32, num_heads=2, num_layers=1,
                                        causal=True, layer_scale=0.01, context=25,
                                        max_period=10000, gating="none",
                                        norm="layer_norm",
                                        positional_embedding="rope",
                                        dim_feedforward=64),
                       quantizer=qk)
    (root / "mimi_config.json").write_text(json.dumps(mimi_config))

    # ---- tiny LM
    cfg = tiny_lm_config()
    ref_lm = _build_reference_lm(torch, cfg)
    save_file(ref_lm.state_dict(), str(root / "model.safetensors"))

    lm_config = dict(
        dim=cfg.dim, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        hidden_scale=cfg.hidden_scale, n_q=cfg.n_q, dep_q=cfg.dep_q,
        card=cfg.card, text_card=cfg.text_card, norm=cfg.norm,
        context=cfg.context, causal=True, max_period=cfg.max_period,
        gating=cfg.gating, positional_embedding=cfg.positional_embedding,
        depformer_dim=cfg.depformer_dim,
        depformer_num_heads=cfg.depformer_num_heads,
        depformer_num_layers=cfg.depformer_num_layers,
        depformer_dim_feedforward=cfg.depformer_dim_feedforward,
        depformer_gating=cfg.depformer_gating,
        depformer_pos_emb=cfg.depformer_pos_emb,
        depformer_multi_linear=cfg.depformer_multi_linear,
        depformer_weights_per_step=cfg.depformer_weights_per_step,
        delays=list(cfg.delays),
        moshi_name="model.safetensors", mimi_name="mimi.safetensors",
        mimi_config_name="mimi_config.json", model_type="moshi",
        lm_gen_config={"temp": 0.8, "temp_text": 0.7},
    )
    (root / "config.json").write_text(json.dumps(lm_config))
    return root


def test_checkpoint_dir_loads(tiny_checkpoint):
    from moshi_tpu.models.loaders import CheckpointInfo
    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    assert mimi.frame_size == 1920
    assert lm.config.dim == 32
    # codes from the loaded mimi must be valid
    import jax.numpy as jnp
    x = jnp.zeros((1, 1, 1920 * 2))
    codes = mimi.encode(mimi_params, x)
    assert codes.shape == (1, mimi.num_codebooks, 2)


def test_export_quantized_roundtrip(tiny_checkpoint, tmp_path):
    """export_quantized output must load back through CheckpointInfo.from_dir
    (ADVICE r1: the native_format key used to be rejected)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import export_quantized
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.utils.quantize import QTensor
    import jax
    import jax.numpy as jnp

    out = export_quantized.export(tiny_checkpoint, tmp_path / "q8", min_size=1)
    info = CheckpointInfo.from_dir(out)
    assert info.native_format
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    assert isinstance(lm_params["transformer"]["layers"]["attn"]["in_proj"], QTensor)

    x = jnp.zeros((1, 1, mimi.frame_size * 2))
    codes = mimi.encode(mimi_params, x)
    assert codes.shape == (1, mimi.num_codebooks, 2)

    # quantized LM steps produce valid tokens
    from moshi_tpu.models.lm_gen import LMGen, LMGenConfig
    gen = LMGen(lm, LMGenConfig(use_sampling=False))
    st = gen.init_state(1, jax.random.PRNGKey(0), dtype=jnp.float32)
    n_in = lm.config.num_codebooks - lm.config.dep_q - 1
    toks = jnp.zeros((1, n_in, 1), jnp.int32)
    for _ in range(lm.config.max_delay + 2):
        outt, st = gen.step(lm_params, st, toks)
    import numpy as np
    assert (np.asarray(outt) >= 0).all()


def test_websocket_server_control_protocol(tiny_checkpoint):
    """MT 3 control (pause/start/restart), 4 metadata, 6 ping handling per
    rust/protocol.md:1-31; unknown message types are discarded."""
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu.serve import protocol as proto
    from moshi_tpu import moshi_native

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, None,
                        **info.lm_gen_config)
    state.warmup()

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/chat")
            assert (await ws.receive_bytes())[:1] == b"\x00"

            # ping is answered with ping
            await ws.send_bytes(bytes([proto.MT_PING]))
            msg = await asyncio.wait_for(ws.receive_bytes(), timeout=5)
            assert msg == bytes([proto.MT_PING])

            # metadata is accepted silently
            await ws.send_bytes(bytes([proto.MT_METADATA]) + b'{"client":"test"}')
            # unknown message type is discarded silently
            await ws.send_bytes(bytes([42]) + b"garbage")

            writer = moshi_native.OpusStreamWriter(mimi.sample_rate)
            rs = np.random.RandomState(0)

            async def send_frames(n):
                """Send n frames; return audio payload count received."""
                audio = 0
                for _ in range(n):
                    data = writer.append_pcm(
                        (rs.randn(1920) * 0.05).astype(np.float32))
                    if data:
                        await ws.send_bytes(bytes([proto.MT_AUDIO]) + data)
                    while True:
                        try:
                            m = await asyncio.wait_for(ws.receive(), timeout=0.1)
                        except asyncio.TimeoutError:
                            break
                        if m.type == aiohttp.WSMsgType.BINARY:
                            if m.data[:1] == bytes([proto.MT_AUDIO]):
                                audio += 1
                            elif m.data[:1] == bytes([proto.MT_METADATA]):
                                import json as _json
                                events.append(_json.loads(m.data[1:]))
                return audio

            events = []
            got_before = await send_frames(8)
            assert got_before > 0, "no audio before pause"

            # pause: input discarded, no output produced
            await ws.send_bytes(bytes([proto.MT_CONTROL, proto.CTRL_PAUSE]))
            got_paused = await send_frames(4)
            assert got_paused == 0, "server produced audio while paused"

            # start resumes (session state continues)
            await ws.send_bytes(bytes([proto.MT_CONTROL, proto.CTRL_START]))
            got_resumed = await send_frames(6)
            assert got_resumed > 0, "no audio after resume"

            # restart resets the session in place and acks with metadata
            await ws.send_bytes(bytes([proto.MT_CONTROL, proto.CTRL_RESTART]))
            got_restarted = await send_frames(8)
            assert any(e.get("event") == "restarted" for e in events)
            assert got_restarted > 0, "no audio after restart"
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_websocket_server_roundtrip(tiny_checkpoint):
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu import moshi_native

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)

    state = ServerState(info, mimi, mimi_params, lm, lm_params, None,
                        **info.lm_gen_config)
    state.warmup()

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/chat")
            first = await ws.receive_bytes()
            assert first[:1] == b"\x00"  # handshake (strict 8-byte payload ok)

            writer = moshi_native.OpusStreamWriter(mimi.sample_rate)
            rs = np.random.RandomState(0)
            got_audio = []
            nframes = 8
            for i in range(nframes):
                pcm = (rs.randn(1920) * 0.05).astype(np.float32)
                data = writer.append_pcm(pcm)
                if data:
                    await ws.send_bytes(b"\x01" + data)
                # drain anything available
                while True:
                    try:
                        msg = await asyncio.wait_for(ws.receive(), timeout=0.05)
                    except asyncio.TimeoutError:
                        break
                    if msg.type == aiohttp.WSMsgType.BINARY and msg.data[:1] == b"\x01":
                        got_audio.append(msg.data[1:])
            # allow trailing responses
            for _ in range(20):
                try:
                    msg = await asyncio.wait_for(ws.receive(), timeout=0.3)
                except asyncio.TimeoutError:
                    break
                if msg.type == aiohttp.WSMsgType.BINARY and msg.data[:1] == b"\x01":
                    got_audio.append(msg.data[1:])
            await ws.close()
            assert got_audio, "server produced no audio"
            reader = moshi_native.OpusStreamReader(mimi.sample_rate)
            pcm_out = np.frombuffer(reader.append_bytes(b"".join(got_audio)),
                                    np.float32)
            assert pcm_out.size > 0
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_websocket_server_raw_pcm_extension(tiny_checkpoint):
    """The web client's raw-PCM path: metadata {"raw_pcm": true} negotiation,
    MT-10 f32 frames both ways, text on MT 2."""
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
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

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/chat")
            assert (await ws.receive_bytes())[:1] == b"\x00"
            await ws.send_bytes(bytes([4]) + json.dumps(
                {"raw_pcm": True}).encode())
            meta = json.loads((await asyncio.wait_for(
                ws.receive_bytes(), timeout=10))[1:])
            assert meta == {"raw_pcm": True, "sample_rate": 24000,
                            "frame_size": 1920}
            rs = np.random.RandomState(0)
            got_pcm = 0
            for _ in range(10):
                frame = (rs.randn(1920) * 0.05).astype(np.float32)
                await ws.send_bytes(bytes([10]) + frame.tobytes())
                while True:
                    try:
                        m = await asyncio.wait_for(ws.receive(), timeout=0.2)
                    except asyncio.TimeoutError:
                        break
                    if m.type == aiohttp.WSMsgType.BINARY and m.data[0] == 10:
                        assert len(m.data) == 1 + 1920 * 4
                        got_pcm += 1
            assert got_pcm > 0, "no raw pcm frames returned"
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_handshake_strict_payload():
    """MT-0 handshake carries protocol version u32 + model version u32 LE
    (rust/protocol.md:11-13)."""
    import struct
    from moshi_tpu.serve import protocol as proto

    hs = proto.handshake(model_version=7)
    assert hs[0] == proto.MT_HANDSHAKE and len(hs) == 9
    pv, mv = struct.unpack("<II", hs[1:])
    assert pv == proto.PROTOCOL_VERSION and mv == 7


class _FakeTok:
    def id_to_piece(self, t):
        return f"tok{t}"


def test_colored_text_mt7(tiny_checkpoint):
    """colored_text servers emit MT 7 frames: 1 confidence-color byte (0-10)
    + utf-8 text (protocol.rs:30-53; client TextDisplay palette)."""
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu.serve import protocol as proto

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    cfg = dict(info.lm_gen_config)
    cfg["colored_text"] = True
    state = ServerState(info, mimi, mimi_params, lm, lm_params, _FakeTok(),
                        **cfg)
    state.warmup()

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/chat")
            assert (await ws.receive_bytes())[:1] == b"\x00"
            await ws.send_bytes(bytes([proto.MT_METADATA])
                                + b'{"raw_pcm": true}')
            msg = await asyncio.wait_for(ws.receive_bytes(), timeout=10)
            assert msg[0] == proto.MT_METADATA
            rs = np.random.RandomState(0)
            colored = []
            fs = state.frame_size
            for _ in range(12):
                pcm = (rs.randn(fs) * 0.05).astype(np.float32)
                await ws.send_bytes(bytes([proto.MT_PCM]) + pcm.tobytes())
                try:
                    while True:
                        msg = await asyncio.wait_for(ws.receive_bytes(),
                                                     timeout=2)
                        if msg[0] == proto.MT_COLOREDTEXT:
                            colored.append(msg)
                except asyncio.TimeoutError:
                    pass
            assert colored, "no MT 7 frames observed"
            for msg in colored:
                assert 0 <= msg[1] <= 10  # palette index
                assert msg[2:].decode("utf-8").startswith("tok")
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_image_embeddings_mt8():
    """MT 8 image-embedding input routes to the vision preset's gated
    cross-attention (VERDICT r2 ask #7): server acks with metadata and the
    generation state carries the cross K/V rows; frames keep flowing."""
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import struct
    import jax
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from test_lm import tiny_lm_config
    from test_mimi import tiny_mimi_config
    from moshi_tpu.models.lm import LMModel
    from moshi_tpu.models.mimi import MimiModel
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu.serve import protocol as proto

    cfg = tiny_lm_config(cross_attention=True,
                         cross_attention_gating="conditional_gated_sigmoid")
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    info = CheckpointInfo({"model_type": "moshi"})
    state = ServerState(info, mimi, mimi_params, lm, lm_params, None)
    state.warmup()

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/chat")
            assert (await ws.receive_bytes())[:1] == b"\x00"
            await ws.send_bytes(bytes([proto.MT_METADATA])
                                + b'{"raw_pcm": true}')
            msg = await asyncio.wait_for(ws.receive_bytes(), timeout=10)
            assert msg[0] == proto.MT_METADATA

            emb = np.random.RandomState(0).randn(3, cfg.dim).astype(np.float32)
            await ws.send_bytes(bytes([proto.MT_IMAGE])
                                + struct.pack("<II", 3, cfg.dim)
                                + emb.tobytes())
            msg = await asyncio.wait_for(ws.receive_bytes(), timeout=10)
            assert msg[0] == proto.MT_METADATA
            assert json.loads(msg[1:])["image"] == "ok"
            assert "k_cross" in state.gen_state["transformer"]

            fs = state.frame_size
            rs = np.random.RandomState(1)
            got_audio = False
            for _ in range(8):
                pcm = (rs.randn(fs) * 0.05).astype(np.float32)
                await ws.send_bytes(bytes([proto.MT_PCM]) + pcm.tobytes())
                try:
                    while True:
                        msg = await asyncio.wait_for(ws.receive_bytes(),
                                                     timeout=2)
                        if msg[0] == proto.MT_PCM:
                            got_audio = True
                except asyncio.TimeoutError:
                    pass
            assert got_audio, "no audio frames after image embedding"
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_session_config_query_params(tiny_checkpoint):
    """Per-session sampling params via ws query params (reference
    Conversation.tsx:58-66 / rust SessionConfigReq, stream_both.rs:93-155):
    the server selects a memoized LMGen for the overrides, echoes the
    effective config as MT-4 metadata, and enforces max_steps."""
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve import protocol as proto
    from moshi_tpu.serve.server import ServerState

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, None,
                        **info.lm_gen_config)
    state.warmup()
    default_cfg = state.lm_gen.gc

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect(
                "/api/chat?text_temperature=0.3&audio_topk=17"
                "&pad_mult=2.5&text_seed=42&max_steps=5")
            assert (await ws.receive_bytes())[:1] == b"\x00"
            meta = json.loads((await asyncio.wait_for(
                ws.receive_bytes(), timeout=10))[1:])
            assert meta["text_temperature"] == 0.3
            assert meta["audio_topk"] == 17
            assert meta["pad_mult"] == 2.5
            assert meta["max_steps"] == 5
            # the session's LMGen carries the overrides; others defaulted
            c = state.lm_gen.gc
            assert c.temp_text == 0.3 and c.top_k == 17
            assert c.padding_bonus == 2.5
            assert c.temp == default_cfg.temp
            # drive raw-pcm frames: session must close at max_steps
            await ws.send_bytes(bytes([4]) + json.dumps(
                {"raw_pcm": True}).encode())
            rs = np.random.RandomState(0)
            closed = False
            for _ in range(12):
                frame = (rs.randn(1920) * 0.05).astype(np.float32)
                await ws.send_bytes(bytes([10]) + frame.tobytes())
                try:
                    while True:
                        m = await asyncio.wait_for(ws.receive(), timeout=0.2)
                        if m.type in (aiohttp.WSMsgType.CLOSE,
                                      aiohttp.WSMsgType.CLOSED,
                                      aiohttp.WSMsgType.CLOSING):
                            closed = True
                            break
                except asyncio.TimeoutError:
                    pass
                if closed:
                    break
            assert closed, "session not closed after max_steps frames"
            await ws.close()

            # a second session with NO params gets the defaults back and
            # does not see a config echo before the raw-pcm reply
            ws2 = await client.ws_connect("/api/chat")
            assert (await ws2.receive_bytes())[:1] == b"\x00"
            assert state.lm_gen.gc == default_cfg
            await ws2.send_bytes(bytes([4]) + json.dumps(
                {"raw_pcm": True}).encode())
            meta2 = json.loads((await asyncio.wait_for(
                ws2.receive_bytes(), timeout=10))[1:])
            assert meta2["raw_pcm"] is True
            await ws2.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_session_queue_and_queue_api(tiny_checkpoint):
    """Single-session queueing: a second concurrent ws client waits with MT 4
    {"status": "wait", "queue_position": n} updates and is served (handshake)
    once the first disconnects; the demo-shaped HTTP queue API
    (client/src/pages/Queue/api/validators.ts: add_user -> {session_id,
    session_auth_id}, check_user -> {status, worker_addr, current_position})
    hands out tickets FIFO."""
    pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState, QueueAPI

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, None,
                        **info.lm_gen_config)
    state.warmup()

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        QueueAPI(state, "ws://test/api/chat").add_routes(app)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # --- ws-level queue: first client holds the single session
            ws1 = await client.ws_connect("/api/chat")
            assert (await asyncio.wait_for(
                ws1.receive_bytes(), timeout=10))[:1] == b"\x00"

            # opted-in client gets live queue-position updates
            ws2 = await client.ws_connect("/api/chat?resume_support=1")
            first = await asyncio.wait_for(ws2.receive_bytes(), timeout=10)
            assert first[0] == 4, "queued client should get metadata, not \\x00"
            meta = json.loads(first[1:])
            assert meta["status"] == "wait" and meta["queue_position"] == 1

            # a BARE queued client must see the reference wire sequence:
            # silence while queued, handshake as the FIRST message
            ws3 = await client.ws_connect("/api/chat")
            with pytest.raises(asyncio.TimeoutError):
                await asyncio.wait_for(ws3.receive_bytes(), timeout=1.5)

            await ws1.close()
            # ws2 is promoted: eventually receives the handshake
            while True:
                msg = await asyncio.wait_for(ws2.receive_bytes(), timeout=10)
                if msg[:1] == b"\x00":
                    break
                assert msg[0] == 4  # more wait updates are fine
            await ws2.close()
            # ws3 promoted next: handshake is its first message
            first3 = await asyncio.wait_for(ws3.receive_bytes(), timeout=10)
            assert first3[:1] == b"\x00"
            await ws3.close()
            await asyncio.sleep(0.1)  # let the server release the session

            # --- HTTP queue API
            r = await client.get("/add_user", params={"queue_id": "q"})
            t1 = await r.json()
            assert set(t1) == {"session_id", "session_auth_id"}
            r = await client.get("/add_user", params={"queue_id": "q"})
            t2 = await r.json()

            # second ticket waits behind the first
            r = await client.get("/check_user", params={
                "session_id": str(t2["session_id"]),
                "session_auth_id": t2["session_auth_id"]})
            c2 = await r.json()
            assert c2["status"] == "wait" and c2["current_position"] == "1"
            assert c2["worker_addr"] is None

            # first ticket is ready (session lock free) and gets the address
            r = await client.get("/check_user", params={
                "session_id": str(t1["session_id"]),
                "session_auth_id": t1["session_auth_id"]})
            c1 = await r.json()
            assert c1["status"] == "ready"
            assert c1["worker_addr"] == "ws://test/api/chat"
            assert c1["worker_auth_id"] == t1["session_auth_id"]

            # now the second ticket moves to the head
            r = await client.get("/check_user", params={
                "session_id": str(t2["session_id"]),
                "session_auth_id": t2["session_auth_id"]})
            assert (await r.json())["status"] == "ready"

            # bad auth is rejected
            r = await client.get("/check_user", params={
                "session_id": "999", "session_auth_id": "nope"})
            assert r.status == 404

            # feedback is acked
            r = await client.get("/user_feedback", params={"feedback": "1"})
            assert (await r.json())["ok"] is True
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_session_resume(tiny_checkpoint):
    """One-shot session resume: a 7-frame conversation split 4 + (resume) 3
    produces bit-identical audio/text to an unbroken 7-frame session — the
    snapshot restores the full streaming state (conv tails, ring KV, delay
    cache, rng chain).  Wrong tokens fall back to a fresh session."""
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState

    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, _FakeTok(),
                        **info.lm_gen_config)
    state.warmup()
    frame = np.zeros(1920, np.float32).tobytes()

    async def start_session(client, query):
        ws = await client.ws_connect("/api/chat" + query)
        assert (await asyncio.wait_for(ws.receive_bytes(), 10))[:1] == b"\x00"
        meta = json.loads((await asyncio.wait_for(ws.receive_bytes(), 10))[1:])
        await ws.send_bytes(bytes([4]) + json.dumps({"raw_pcm": True}).encode())
        reply = json.loads((await asyncio.wait_for(ws.receive_bytes(), 10))[1:])
        assert reply["raw_pcm"] is True
        return ws, meta

    async def drive(ws, n, pcms, texts):
        for _ in range(n):
            await ws.send_bytes(bytes([10]) + frame)
            while True:
                try:
                    m = await asyncio.wait_for(ws.receive(), timeout=0.25)
                except asyncio.TimeoutError:
                    break
                if m.type != aiohttp.WSMsgType.BINARY:
                    break
                if m.data[0] == 10:
                    pcms.append(m.data[1:])
                elif m.data[0] == 2:
                    texts.append(m.data[1:])

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # unbroken 7-frame session
            ws, meta = await start_session(client, "?resume_support=1")
            assert meta["resumed"] is False and meta["resume_id"]
            pcm_a, text_a = [], []
            await drive(ws, 7, pcm_a, text_a)
            await ws.close()
            await asyncio.sleep(0.1)

            # split session: 4 frames, drop, resume, 3 frames
            ws, meta = await start_session(client, "?resume_support=1")
            assert meta["resumed"] is False
            rid = meta["resume_id"]
            pcm_b, text_b = [], []
            await drive(ws, 4, pcm_b, text_b)
            await ws.close()
            await asyncio.sleep(0.1)
            ws, meta = await start_session(client, f"?resume={rid}")
            assert meta["resumed"] is True
            await drive(ws, 3, pcm_b, text_b)
            await ws.close()
            await asyncio.sleep(0.1)

            assert len(pcm_a) >= 3
            assert pcm_b == pcm_a, "resumed stream diverged from unbroken"
            assert text_b == text_a

            # a bad token starts fresh instead of resuming
            ws, meta = await start_session(client, "?resume=deadbeef")
            assert meta["resumed"] is False
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_server_mesh_tp(tiny_checkpoint):
    """--tp analog: ServerState over a tp=4 mesh produces the identical
    greedy stream as the single-device server (the 7B-bf16-on-2-chips
    deployment; GSPMD sharding must be semantics-preserving)."""
    import jax
    import jax.numpy as jnp
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    info = CheckpointInfo.from_dir(tiny_checkpoint)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    kw = dict(temp=0.0, temp_text=0.0)
    single = ServerState(info, mimi, mimi_params, lm, lm_params, None, **kw)
    sharded = ServerState(info, mimi, mimi_params, lm, lm_params, None,
                          mesh=make_mesh(4, tp=4), **kw)

    rs = np.random.RandomState(0)
    for _ in range(6):
        chunk = (rs.randn(single.frame_size) * 0.1).astype(np.float32)
        pcm_s, tok_s, _ = single.step_frame(chunk)
        pcm_m, tok_m, _ = sharded.step_frame(chunk)
        assert tok_s == tok_m
        assert (pcm_s is None) == (pcm_m is None)
        if pcm_s is not None:
            np.testing.assert_allclose(pcm_s, pcm_m, atol=2e-4)


def test_session_resume_survives_intervening_session(tiny_checkpoint):
    """Multiple host-offloaded snapshots: user A's resume must still work
    after user B ran (and snapshotted) a whole session in between."""
    pytest.importorskip("aiohttp")
    import asyncio
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
    frame = np.zeros(1920, np.float32).tobytes()

    async def session(client, query, n_frames):
        ws = await client.ws_connect("/api/chat" + query)
        assert (await asyncio.wait_for(ws.receive_bytes(), 10))[:1] == b"\x00"
        meta = json.loads((await asyncio.wait_for(ws.receive_bytes(), 10))[1:])
        await ws.send_bytes(bytes([4]) + json.dumps({"raw_pcm": True}).encode())
        await asyncio.wait_for(ws.receive_bytes(), 10)
        for _ in range(n_frames):
            await ws.send_bytes(bytes([10]) + frame)
            await asyncio.sleep(0.05)
        await asyncio.sleep(0.3)
        await ws.close()
        await asyncio.sleep(0.1)
        return meta

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            meta_a = await session(client, "?resume_support=1", 4)
            rid_a = meta_a["resume_id"]
            # user B runs a full session in between (also snapshots)
            meta_b = await session(client, "?resume_support=1", 2)
            assert meta_b["resumed"] is False
            # A's snapshot must still be alive
            meta_a2 = await session(client, f"?resume={rid_a}", 2)
            assert meta_a2["resumed"] is True
            # and B's too (dict holds several)
            meta_b2 = await session(client, f"?resume={meta_b['resume_id']}", 0)
            assert meta_b2["resumed"] is True
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
