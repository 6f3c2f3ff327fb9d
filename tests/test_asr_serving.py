"""STT offline mode (dep_q=0) through run_inference, and the batched ASR
websocket service end-to-end with the tiny models."""

import asyncio
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_lm import tiny_lm_config
from test_mimi import tiny_mimi_config
from moshi_tpu.models.lm import LMModel
from moshi_tpu.models.mimi import MimiModel


def _tiny_stt():
    cfg = tiny_lm_config(n_q=4, dep_q=0, delays=(0, 0, 0, 0, 0))
    lm = LMModel(cfg)
    lm_params = lm.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi = MimiModel(tiny_mimi_config())
    mimi_params = mimi.init_params(jax.random.PRNGKey(1))
    return lm, lm_params, mimi, mimi_params


def test_run_inference_stt_mode():
    from moshi_tpu.models.loaders import CheckpointInfo
    from moshi_tpu.run_inference import InferenceState

    lm, lm_params, mimi, mimi_params = _tiny_stt()
    info = CheckpointInfo({"model_type": "stt",
                           "stt_config": {"audio_delay_seconds": 0.08,
                                          "audio_silence_prefix_seconds": 0.0},
                           "dep_q": 0, "n_q": 4})
    # CheckpointInfo pops known keys into attrs; lm_config remains
    assert info.model_type == "stt"
    state = InferenceState(info, mimi, mimi_params, lm, lm_params, None,
                           batch_size=1)
    fs = mimi.frame_size
    pcm = (np.random.RandomState(0).randn(1, 1, 4 * fs) * 0.1).astype(np.float32)
    outs = state.run(pcm)
    text_tokens, _ = outs[0]
    assert text_tokens.size >= 3  # one text token per consumed frame


def test_batched_asr_ws_end_to_end():
    aiohttp = pytest.importorskip("aiohttp")
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.models.asr import StreamingASR
    from moshi_tpu.serve.batched_asr import BatchedAsrState, handle_asr_socket
    from moshi_tpu import moshi_native

    lm, lm_params, mimi, mimi_params = _tiny_stt()

    class WordyTok:
        def decode(self, ids):
            return "w" + str(len(ids))

    asr = StreamingASR(mimi, lm, batch_size=2, asr_delay_in_tokens=2,
                       temperature=0.0, text_tokenizer=WordyTok())
    state = BatchedAsrState(asr, mimi_params, lm_params, jax.random.PRNGKey(0))

    async def run():
        app = web.Application()
        app.router.add_get("/api/asr-streaming",
                           lambda r: handle_asr_socket(r, state))
        client = TestClient(TestServer(app))
        await client.start_server()
        loop_task = asyncio.create_task(state.run_loop())
        try:
            ws = await client.ws_connect("/api/asr-streaming")
            msg = await ws.receive()
            assert msg.type == aiohttp.WSMsgType.TEXT, msg
            ready = json.loads(msg.data)
            assert ready["type"] == "Ready"
            rs = np.random.RandomState(0)
            fs = mimi.frame_size
            got = []
            for _ in range(10):
                pcm = (rs.randn(fs) * 0.1).astype(np.float32)
                # use the raw-pcm convenience kind (8)
                await ws.send_bytes(b"\x08" + pcm.tobytes())
                while True:
                    try:
                        msg = await asyncio.wait_for(ws.receive(), timeout=0.1)
                    except asyncio.TimeoutError:
                        break
                    if msg.type == aiohttp.WSMsgType.TEXT:
                        got.append(json.loads(msg.data))
            for _ in range(30):
                try:
                    msg = await asyncio.wait_for(ws.receive(), timeout=0.2)
                except asyncio.TimeoutError:
                    break
                if msg.type == aiohttp.WSMsgType.TEXT:
                    got.append(json.loads(msg.data))
            await ws.close()
            # random-weight model may or may not emit Words; the loop must at
            # least run steps (metrics) without error, and any events parse
            for e in got:
                assert e["type"] in ("Word", "EndWord", "Step"), e
        finally:
            loop_task.cancel()
            await client.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
    from moshi_tpu.serve.metrics import TOTAL_STEPS
    assert TOTAL_STEPS.value >= 5
