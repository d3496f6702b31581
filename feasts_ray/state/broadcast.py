"""ray.put-broadcast helpers shared by task-pool map_batches kernels.

Pattern: the driver ``ray.put``s a lookup structure ONCE and passes the
ObjectRef through ``fn_kwargs`` (refs in fn_kwargs ship by reference in
the task spec, never inlined); each worker PROCESS resolves it once via
a small per-process LRU. This keeps corpus-scan stages as plain
function task pools — elastically sized by the scheduler across however
many nodes exist — instead of actor pools whose fixed ``concurrency``
cap would bottleneck the stage on a big cluster and whose spin-up
dominates small interactive runs.
"""

from __future__ import annotations

import ray

_BROADCAST_CACHE: dict = {}
# Only the CURRENT run's refs are ever resolved again, but Ray worker
# processes outlive a run — an unbounded cache would accumulate one
# broadcast payload per pipeline invocation forever. A tiny LRU (a few
# in-flight stages may interleave in one process) bounds worker memory.
_BROADCAST_CACHE_MAX = 4


def resolve_broadcast(ref):
    """Resolve a ray.put broadcast with a per-worker-process cache: the
    object is fetched+deserialized once per process, not once per task/
    batch. Pass-through for plain objects (tests, driver-side use)."""
    if isinstance(ref, ray.ObjectRef):
        key = ref.hex()
        if key in _BROADCAST_CACHE:
            # move-to-end = LRU recency (dicts preserve insertion order)
            _BROADCAST_CACHE[key] = _BROADCAST_CACHE.pop(key)
        else:
            while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
                _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
            _BROADCAST_CACHE[key] = ray.get(ref)
        return _BROADCAST_CACHE[key]
    return ref


def put_once(obj):
    """ray.put when a session exists (so big lookup structures ship via
    the object store, not per-task closures); pass-through otherwise."""
    return ray.put(obj) if ray.is_initialized() else obj
