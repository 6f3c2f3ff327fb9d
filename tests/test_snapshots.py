"""SnapshotStore: TTL, cap, reserve/fill, one-shot take, host offload."""

import asyncio

import numpy as np
import pytest

from moshi_tpu.serve.snapshots import SnapshotStore, new_resume_id, wants_resume


def test_helpers():
    assert len(new_resume_id()) == 16
    assert wants_resume({"resume": "x"})
    assert wants_resume({"resume_support": "1"})
    assert not wants_resume({"text_temperature": "0.7"})


def test_put_take_roundtrip_and_one_shot():
    async def run():
        st = SnapshotStore(ttl=30.0, cap=2)
        arr = {"a": np.arange(4)}
        st.put("r1", arr, {"k": 1})
        got = await st.take("r1")
        assert got is not None
        arrays, meta = got
        np.testing.assert_array_equal(arrays["a"], np.arange(4))
        assert meta["k"] == 1
        assert await st.take("r1") is None  # one-shot
        assert await st.take(None) is None
        assert await st.take("unknown") is None

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_reserve_makes_fast_reconnects_wait_for_fill():
    """A client reconnecting before the queued extraction drains must wait
    for put() instead of silently starting fresh."""
    async def run():
        st = SnapshotStore(ttl=30.0, cap=2)
        st.reserve("r1")

        async def fill_later():
            await asyncio.sleep(0.15)
            st.put("r1", {"a": np.ones(2)}, {"m": True})

        task = asyncio.create_task(fill_later())
        got = await st.take("r1", fill_timeout=5.0)
        await task
        assert got is not None and got[1]["m"] is True

        # a reservation never filled times out to None (and is dropped)
        st.reserve("r2")
        assert await st.take("r2", fill_timeout=0.2) is None
        assert len(st) == 0

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_take_survives_cap_eviction_of_awaited_reservation():
    """Churn at the cap can evict a reservation while take() awaits its fill
    event; the later put() re-creates the entry with a NEW event.  take()
    must re-resolve the rid after the wait instead of timing out and
    discarding the freshly stored snapshot."""
    async def run():
        st = SnapshotStore(ttl=30.0, cap=2)
        st.reserve("victim")

        async def churn_then_fill():
            await asyncio.sleep(0.05)
            st.put("x1", {"x": np.zeros(1)})  # cap=2: evicts "victim"
            st.put("x2", {"x": np.zeros(1)})
            st.put("victim", {"a": np.ones(3)}, {"late": True})

        task = asyncio.create_task(churn_then_fill())
        got = await st.take("victim", fill_timeout=0.5)
        await task
        assert got is not None and got[1]["late"] is True
        np.testing.assert_array_equal(got[0]["a"], np.ones(3))

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_await_pending_release():
    """acquire racing ahead of the dropped session's release_slot waits for
    the rid to leave the owning map (bounded)."""
    from moshi_tpu.serve.snapshots import await_pending_release

    async def run():
        owned = {3: "rid-a"}

        async def release_later():
            await asyncio.sleep(0.05)
            del owned[3]

        task = asyncio.create_task(release_later())
        await await_pending_release(owned, "rid-a", timeout=1.0)
        assert 3 not in owned
        await task
        # unknown rid / None: immediate no-ops
        await await_pending_release(owned, "unknown")
        await await_pending_release(owned, None)
        # never released: returns after the bounded timeout
        owned[4] = "rid-b"
        await asyncio.wait_for(
            await_pending_release(owned, "rid-b", timeout=0.1), 2.0)

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())


def test_ttl_and_cap():
    async def run():
        st = SnapshotStore(ttl=0.1, cap=2)
        st.put("a", {"x": np.zeros(1)})
        await asyncio.sleep(0.15)
        assert await st.take("a") is None  # expired

        st = SnapshotStore(ttl=30.0, cap=2)
        for rid in ("a", "b", "c"):
            st.put(rid, {"x": np.zeros(1)})
        assert len(st) == 2
        assert await st.take("a") is None  # evicted (oldest)
        assert await st.take("c") is not None

        disabled = SnapshotStore(ttl=0.0)
        disabled.put("a", {"x": np.zeros(1)})
        disabled.reserve("b")
        assert len(disabled) == 0

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(run())
