"""Session-resume snapshot store, shared by the single-session and batched
servers.

A snapshot is (array pytree, host metadata), keyed by the resume_id that was
announced to the client at session start.  Entries are TTL'd, capped, and
their arrays are moved to host RAM by a background task so HBM is never
pinned for the TTL.  `take` is one-shot and awaits any in-flight offload
first — restoring the original device buffers while `jax.device_get` still
reads them would race with the resumed session's donated first step.
"""

import asyncio
import time

import jax


class SnapshotStore:
    def __init__(self, ttl: float = 60.0, cap: int = 4):
        self.ttl = ttl
        self.cap = cap
        # rid -> [expires, arrays, meta, offload_task | None]
        self._items: dict[str, list] = {}

    def __len__(self):
        return len(self._items)

    def sweep(self):
        now = time.time()
        for k in [k for k, it in self._items.items() if now > it[0]]:
            del self._items[k]

    def put(self, rid: str, arrays, meta: dict | None = None):
        """Store under `rid` and offload `arrays` to host in the background.
        No-op when ttl <= 0."""
        if self.ttl <= 0:
            return
        self.sweep()
        while len(self._items) >= self.cap:
            del self._items[next(iter(self._items))]
        item = [time.time() + self.ttl, arrays, dict(meta or {}), None]
        self._items[rid] = item

        async def _offload():
            # written even after eviction/take (harmless: the list is then
            # unreferenced) — take() awaits this task and reads item[1]
            item[1] = await asyncio.to_thread(jax.device_get, arrays)

        try:
            item[3] = asyncio.ensure_future(_offload())
        except RuntimeError:
            pass  # no running loop (tests driving sync): stays on device

    async def take(self, rid: str | None):
        """One-shot: returns (arrays, meta) or None.  Waits for the offload
        so the caller always restores from host copies — never from device
        buffers an in-flight device_get still reads (the restored state's
        first step donates them)."""
        self.sweep()
        item = self._items.pop(rid, None) if rid else None
        if item is None:
            return None
        _, arrays, meta, task = item
        if task is not None and not task.done():
            try:
                await task
            except Exception:
                pass
            arrays = item[1]
        return arrays, meta
