"""Generational handle pools for device resources and compiled pipelines.

Capability parity with zd3d12's ResourcePool / PipelinePool
(zd3d12.zig:1728-1970): resources are referenced by (index, generation)
handles so stale handles are detected after destruction; pipelines are
deduplicated by a content hash so identical pipeline configs share one
compiled executable (the Adler32 PSO cache, zd3d12.zig:1007-1012).

On TPU "resources" are device arrays (framebuffers, textures, geometry
buffers) and "pipelines" are jit-compiled executables.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Optional

log = logging.getLogger("zrenderer.pools")

MAX_POOL_SIZE = 256


@dataclass(frozen=True)
class Handle:
    index: int
    generation: int

    def is_null(self) -> bool:
        return self.generation == 0


NULL_HANDLE = Handle(0, 0)


class _Slot:
    __slots__ = ("payload", "generation")

    def __init__(self):
        self.payload = None
        self.generation = 0


class ResourcePool:
    """Fixed-capacity generational pool (zd3d12.zig:1752-1831 semantics)."""

    def __init__(self, capacity: int = MAX_POOL_SIZE, name: str = "resource"):
        self._slots = [_Slot() for _ in range(capacity)]
        self._name = name

    def add(self, payload: Any) -> Handle:
        for i, slot in enumerate(self._slots):
            if slot.payload is None:
                slot.payload = payload
                slot.generation += 1
                return Handle(i, slot.generation)
        raise RuntimeError(f"{self._name} pool exhausted ({len(self._slots)})")

    def is_valid(self, h: Handle) -> bool:
        return (
            not h.is_null()
            and 0 <= h.index < len(self._slots)
            and self._slots[h.index].generation == h.generation
            and self._slots[h.index].payload is not None
        )

    def lookup(self, h: Handle) -> Optional[Any]:
        return self._slots[h.index].payload if self.is_valid(h) else None

    def destroy(self, h: Handle) -> None:
        if self.is_valid(h):
            self._slots[h.index].payload = None

    def __len__(self) -> int:
        return sum(1 for s in self._slots if s.payload is not None)


class PipelineCache:
    """Content-hash-keyed cache of compiled frame pipelines.

    The jit-cache analog of the PSO cache: `get_or_create(key, builder)`
    returns the cached executable for `key` or builds, logs, and stores it
    (hit/miss logging mirrors zd3d12.zig:1007-1012).
    """

    def __init__(self):
        self._cache: dict = {}
        self._pool = ResourcePool(name="pipeline")
        self.hits = 0
        self.misses = 0

    def get_or_create(self, key, builder: Callable[[], Any]):
        if key in self._cache:
            self.hits += 1
            log.debug("pipeline cache hit for key %s", key)
            handle = self._cache[key]
            return self._pool.lookup(handle)
        self.misses += 1
        log.info("pipeline cache miss for key %s — compiling", key)
        payload = builder()
        self._cache[key] = self._pool.add(payload)
        return payload

    # Handle-level API (the PipelinePool surface, zd3d12.zig:1833-1970):
    # addPipeline / lookupPipeline / destroyPipeline for pipelines managed
    # directly by handle rather than by content key.

    def add_pipeline(self, payload: Any) -> Handle:
        return self._pool.add(payload)

    def lookup_pipeline(self, h: Handle) -> Optional[Any]:
        return self._pool.lookup(h)

    def destroy_pipeline(self, h: Handle) -> None:
        self._pool.destroy(h)
        for key, cached in list(self._cache.items()):
            if cached == h:
                del self._cache[key]

    def __len__(self) -> int:
        return len(self._cache)
