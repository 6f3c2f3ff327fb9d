"""Session-resume snapshot store, shared by the single-session and batched
servers.

A snapshot is (array pytree, host metadata), keyed by a resume_id the client
learns at session start when it opted in (``resume_support``/``resume`` query
params; sessions without the opt-in never populate the store).  Entries are
TTL'd, capped, and their arrays are moved to host RAM by a background task so
HBM is never pinned for the TTL.  `take` is one-shot and awaits any in-flight
offload first — restoring the original device buffers while `jax.device_get`
still reads them would race with the resumed session's donated first step.
"""

import asyncio
import time

import jax


def new_resume_id() -> str:
    import secrets
    return secrets.token_hex(8)


# ------------------------------------------------------- wire serialization
def serialize_snapshot(arrays, meta: dict) -> bytes:
    """Encode (state pytree, JSON-able metadata) as one safetensors blob for
    cross-worker migration (the pytree goes through native_ckpt's flat
    encoding, so QTensor/int-KV leaves survive; no pickling anywhere)."""
    import json
    import numpy as np
    import ml_dtypes
    from safetensors.numpy import save
    from ..models.native_ckpt import flatten_tree
    flat, bf16_keys = {}, []
    for k, v in flatten_tree({"state": arrays}).items():
        x = np.asarray(jax.device_get(v))
        if x.dtype == ml_dtypes.bfloat16:
            # safetensors' in-memory numpy codec has no BF16: ship the raw
            # bits as uint16 and re-view at load (keys recorded in meta)
            x = x.view(np.uint16)
            bf16_keys.append(k)
        flat[k] = np.ascontiguousarray(x)
    header = {"meta": meta, "bf16": bf16_keys}
    flat["__meta__"] = np.frombuffer(
        json.dumps(header).encode("utf-8"), np.uint8).copy()
    return save(flat)


def deserialize_snapshot(data: bytes):
    """Inverse of serialize_snapshot: returns (arrays pytree, meta dict)."""
    import json
    import numpy as np
    import ml_dtypes
    from safetensors.numpy import load
    from ..models.native_ckpt import unflatten_tree
    flat = dict(load(data))
    header = json.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    for k in header["bf16"]:
        flat[k] = flat[k].view(ml_dtypes.bfloat16)
    return unflatten_tree(flat)["state"], header["meta"]


def wants_resume(query) -> bool:
    return "resume_support" in query or "resume" in query


class RidRegistry(dict):
    """slot -> resume_id mapping that wakes awaiters when a rid is popped
    (i.e. its owning slot was released and the snapshot stored/reserved)."""

    def __init__(self):
        super().__init__()
        self._released: dict[str, asyncio.Event] = {}

    def _event(self, rid: str) -> asyncio.Event:
        ev = self._released.get(rid)
        if ev is None:
            ev = self._released[rid] = asyncio.Event()
        return ev

    def pop(self, slot, default=None):
        rid = super().pop(slot, default)
        if rid is not None:
            ev = self._released.pop(rid, None)
            if ev is not None:
                ev.set()
        return rid


async def await_pending_release(slot_resume_id: dict, rid: str | None,
                                timeout: float = 1.0):
    """A reconnect's acquire_slot can win the event loop over the dropped
    session's parked release_slot; without this, take() finds no entry and
    the session silently starts fresh while release_slot then stores an
    orphan snapshot.  Waits (bounded) until the rid's owning slot has been
    released — i.e. its snapshot has been reserved/stored — before the
    caller locks and looks it up.  Call BEFORE taking the server lock
    (release_slot needs it).  No-op for unknown or already-released rids."""
    if not rid or rid not in slot_resume_id.values():
        return
    if isinstance(slot_resume_id, RidRegistry):
        try:
            await asyncio.wait_for(slot_resume_id._event(rid).wait(), timeout)
        except asyncio.TimeoutError:
            pass
        return
    deadline = time.monotonic() + timeout
    while rid in slot_resume_id.values() and time.monotonic() < deadline:
        await asyncio.sleep(0.01)


class SnapshotStore:
    def __init__(self, ttl: float = 60.0, cap: int = 4):
        self.ttl = ttl
        self.cap = cap
        # rid -> [expires, arrays, meta, offload_task | None, filled_event]
        self._items: dict[str, list] = {}

    def __len__(self):
        return len(self._items)

    def sweep(self):
        now = time.time()
        for k in [k for k, it in self._items.items() if now > it[0]]:
            del self._items[k]

    def reserve(self, rid: str):
        """Placeholder for a snapshot whose extraction is still queued
        behind an in-flight batch step: a client reconnecting faster than
        one frame must wait for put() instead of silently starting fresh.
        No-op when ttl <= 0."""
        if self.ttl <= 0:
            return
        self.sweep()
        while len(self._items) >= self.cap:
            del self._items[next(iter(self._items))]
        try:
            event = asyncio.Event()
        except RuntimeError:
            event = None
        self._items[rid] = [time.time() + self.ttl, None, None, None, event]

    def put(self, rid: str, arrays, meta: dict | None = None):
        """Store under `rid` (filling a reservation if present) and offload
        `arrays` to host in the background.  No-op when ttl <= 0."""
        if self.ttl <= 0:
            return
        item = self._items.get(rid)
        if item is None:
            self.sweep()
            while len(self._items) >= self.cap:
                del self._items[next(iter(self._items))]
            item = [time.time() + self.ttl, None, None, None, None]
            self._items[rid] = item
        item[1] = arrays
        item[2] = dict(meta or {})
        if item[4] is not None:
            item[4].set()

        async def _offload():
            # written even after eviction/take (harmless: the list is then
            # unreferenced) — take() awaits this task and reads item[1]
            item[1] = await asyncio.to_thread(jax.device_get, arrays)

        try:
            item[3] = asyncio.ensure_future(_offload())
        except RuntimeError:
            pass  # no running loop (tests driving sync): stays on device

    async def take(self, rid: str | None, fill_timeout: float = 5.0):
        """One-shot: returns (arrays, meta) or None.  Waits for a reserved
        entry to be filled (the extraction op drains between frames) and
        for the offload, so the caller always restores from host copies —
        never from device buffers an in-flight device_get still reads (the
        restored state's first step donates them)."""
        self.sweep()
        # look up WITHOUT popping first: put() fills a reservation by rid,
        # so the entry must stay findable while we await the fill event
        item = self._items.get(rid) if rid else None
        if item is None:
            return None
        if item[1] is None and item[4] is not None:
            try:
                await asyncio.wait_for(item[4].wait(), fill_timeout)
            except asyncio.TimeoutError:
                pass
            # the awaited reservation may have been cap-evicted and
            # re-created by put() while we waited (its event is then a
            # different object that never fires for us): re-resolve the rid
            # so a freshly stored snapshot is found instead of discarded
            item = self._items.get(rid, item)
        self._items.pop(rid, None)
        if item[1] is None:
            return None
        task = item[3]
        if task is not None and not task.done():
            try:
                await task
            except Exception:
                pass
        return item[1], item[2]
