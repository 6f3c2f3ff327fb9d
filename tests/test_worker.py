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
