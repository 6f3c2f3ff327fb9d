"""scripts/make_tiny_checkpoint.py: the torch-free synthetic checkpoint must
load through the standard CheckpointInfo path and serve a websocket session
through the real ServerState — the same surface `python -m
moshi_tpu.serve.server --checkpoint-dir <dir>` uses (its main() is exercised
by hand-running the CLI; here the state/protocol path is covered in-process).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture(scope="module")
def tiny_native_ckpt(tmp_path_factory):
    import make_tiny_checkpoint
    return make_tiny_checkpoint.make(tmp_path_factory.mktemp("tiny_native"))


def test_loads_through_checkpoint_info(tiny_native_ckpt):
    import jax.numpy as jnp
    from moshi_tpu.models.loaders import CheckpointInfo

    info = CheckpointInfo.from_dir(tiny_native_ckpt)
    assert info.native_format
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi()
    assert mimi.frame_size == 1920          # real 24 kHz serving geometry
    assert mimi.config.sample_rate == 24000
    assert lm.config.dim == 32

    codes = mimi.encode(mimi_params, jnp.zeros((1, 1, 1920 * 2)))
    assert codes.shape == (1, mimi.num_codebooks, 2)
    audio = mimi.decode(mimi_params, codes)
    assert audio.shape[-1] == 1920 * 2


def test_tokenizer_covers_text_card(tiny_native_ckpt):
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.text.spm import SentencePieceTokenizer

    info = CheckpointInfo.from_dir(tiny_native_ckpt)
    tok = SentencePieceTokenizer(info.tokenizer_path)
    # every sampleable text token id must decode to a piece (the server
    # emits id_to_piece for ids outside {0, 3})
    for tid in range(info.lm_config["text_card"]):
        assert isinstance(tok.id_to_piece(tid), str)


def test_serves_a_session(tiny_native_ckpt):
    aiohttp = pytest.importorskip("aiohttp")
    import asyncio
    import jax.numpy as jnp
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.serve.server import ServerState
    from moshi_tpu.serve import protocol as proto
    from moshi_tpu.text.spm import SentencePieceTokenizer

    info = CheckpointInfo.from_dir(tiny_native_ckpt)
    mimi, mimi_params = info.get_mimi()
    lm, lm_params = info.get_moshi(dtype=jnp.float32)
    tok = SentencePieceTokenizer(info.tokenizer_path)
    state = ServerState(info, mimi, mimi_params, lm, lm_params, tok,
                        **info.lm_gen_config)
    state.warmup()

    async def run():
        app = web.Application()
        app.router.add_get("/api/chat", state.handle_chat)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # raw-PCM extension (MT 10) — the web client's fallback path
            ws = await client.ws_connect("/api/chat")
            assert (await ws.receive_bytes())[:1] == b"\x00"
            await ws.send_bytes(
                bytes([proto.MT_METADATA]) + b'{"raw_pcm": true}')
            pcm = np.zeros(1920, np.float32)
            got_audio = got_text = False
            for _ in range(30):
                await ws.send_bytes(bytes([proto.MT_PCM]) + pcm.tobytes())
                while True:
                    try:
                        msg = await asyncio.wait_for(ws.receive_bytes(),
                                                     timeout=2)
                    except asyncio.TimeoutError:
                        break
                    if msg[0] == proto.MT_PCM:
                        got_audio = True
                    elif msg[0] in (proto.MT_TEXT, proto.MT_COLOREDTEXT):
                        got_text = True
                if got_audio and got_text:
                    break
            assert got_audio, "no audio frames came back"
            assert got_text, "random-weight LM + full-vocab spm should emit text"
            await ws.close()
        finally:
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
