"""Fleet dispatcher: FIFO tickets over a worker pool, live /metrics load."""

import asyncio
import time

import pytest

from moshi_tpu.serve.dispatcher import Worker, Dispatcher, metrics_url


def test_metrics_url():
    assert metrics_url("ws://h:8998/api/chat") == "http://h:8998/metrics"
    assert metrics_url("wss://h/api/chat") == "https://h/metrics"
    with pytest.raises(ValueError):
        metrics_url("http://h/")


def test_dispatcher_fifo_and_capacity():
    w = Worker("ws://a:1/api/chat", capacity=1, lease_ttl=0.2)
    d = Dispatcher([w])
    t1, t2 = d.add_user(), d.add_user()

    # FIFO: t2 waits behind t1 even though the worker has room
    c2 = d.check_user(t2["session_id"], t2["session_auth_id"])
    assert c2["status"] == "wait" and c2["current_position"] == "1"

    c1 = d.check_user(t1["session_id"], t1["session_auth_id"])
    assert c1["status"] == "ready" and c1["worker_addr"] == w.addr

    # t2 now at the head, but the worker is at capacity (lease held)
    c2 = d.check_user(t2["session_id"], t2["session_auth_id"])
    assert c2["status"] == "wait" and c2["current_position"] == "0"

    time.sleep(0.25)  # lease expires (session would show in open_channels)
    c2 = d.check_user(t2["session_id"], t2["session_auth_id"])
    assert c2["status"] == "ready"

    # unknown ticket / bad auth
    assert d.check_user(999, "x") is None
    assert d.check_user(t1["session_id"], "wrong") is None


def test_dispatcher_least_loaded_and_polled_counts():
    w1 = Worker("ws://a:1/api/chat", capacity=4)
    w2 = Worker("ws://b:1/api/chat", capacity=4)
    w1.open = 2  # polled live sessions
    w2.open = 0
    d = Dispatcher([w1, w2])
    t = d.add_user()
    c = d.check_user(t["session_id"], t["session_auth_id"])
    assert c["worker_addr"] == w2.addr

    # polled count at capacity blocks assignment even with no leases
    w1.open = 4
    w2.open = 4
    t = d.add_user()
    c = d.check_user(t["session_id"], t["session_auth_id"])
    assert c["status"] == "wait"

    # unreachable workers are skipped entirely
    w1.open, w2.open = 0, 0
    w1.reachable = False
    t2 = d.check_user(t["session_id"], t["session_auth_id"])
    assert t2["worker_addr"] == w2.addr


def test_dispatcher_http_with_live_metrics():
    """End-to-end over HTTP: fake workers expose /metrics; the poll loop
    feeds real load into assignment decisions."""
    pytest.importorskip("aiohttp")
    from aiohttp import web
    from aiohttp.test_utils import TestServer, TestClient
    from moshi_tpu.serve.dispatcher import add_routes, poll_workers

    async def run():
        opens = {"a": 1, "b": 0}

        def fake_worker(name):
            async def metrics(_):
                return web.Response(text=f"open_channels {opens[name]}\n")
            app = web.Application()
            app.router.add_get("/metrics", metrics)
            return app

        wa, wb = TestServer(fake_worker("a")), TestServer(fake_worker("b"))
        await wa.start_server()
        await wb.start_server()
        workers = [Worker(f"ws://127.0.0.1:{wa.port}/api/chat", capacity=2),
                   Worker(f"ws://127.0.0.1:{wb.port}/api/chat", capacity=2)]
        disp = Dispatcher(workers)
        app = web.Application()
        add_routes(app, disp)
        client = TestClient(TestServer(app))
        await client.start_server()
        poll_task = asyncio.create_task(poll_workers(workers, interval=0.05))

        async def until_polled(pred, timeout=10.0):
            # wait for poll rounds by condition, not wall time: a fixed
            # sleep flakes on a loaded 1-core CI host
            deadline = asyncio.get_event_loop().time() + timeout
            while not pred():
                assert asyncio.get_event_loop().time() < deadline, \
                    "poll loop never produced the expected metrics"
                await asyncio.sleep(0.02)

        try:
            await until_polled(lambda: workers[0].open == 1
                               and workers[1].open == 0)

            t = await (await client.get("/add_user")).json()
            c = await (await client.get("/check_user", params={
                "session_id": str(t["session_id"]),
                "session_auth_id": t["session_auth_id"]})).json()
            assert c["status"] == "ready"
            assert c["worker_addr"] == workers[1].addr  # least loaded

            # worker b fills up (polled), a is fuller still -> next waits
            opens["a"], opens["b"] = 2, 2
            await until_polled(lambda: workers[0].open == 2
                               and workers[1].open == 2)
            t = await (await client.get("/add_user")).json()
            c = await (await client.get("/check_user", params={
                "session_id": str(t["session_id"]),
                "session_auth_id": t["session_auth_id"]})).json()
            assert c["status"] == "wait"

            s = await (await client.get("/stats")).json()
            assert s["queued"] == 1 and len(s["workers"]) == 2
        finally:
            poll_task.cancel()
            await client.close()
            await wa.close()
            await wb.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_dispatcher_skips_draining_worker():
    """A worker exposing `draining 1` in /metrics must not receive new
    assignments (it 503s new sessions during a graceful drain)."""
    pytest.importorskip("aiohttp")
    from aiohttp import web
    from aiohttp.test_utils import TestServer
    from moshi_tpu.serve.dispatcher import poll_workers

    async def run():
        async def metrics(_):
            return web.Response(text="open_channels 1\ndraining 1\n")
        app = web.Application()
        app.router.add_get("/metrics", metrics)
        srv = TestServer(app)
        await srv.start_server()
        w = Worker(f"ws://127.0.0.1:{srv.port}/api/chat", capacity=8)
        task = asyncio.create_task(poll_workers([w], interval=0.05))
        try:
            await asyncio.sleep(0.2)
            assert w.open == 1 and w.reachable is False
            assert not w.has_room()
        finally:
            task.cancel()
            await srv.close()

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
