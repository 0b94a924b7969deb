"""LRU caching for expensive computations.

API parity with reference optical_flow/cache.py:15-161 (array-content
hashing, decorator, explicit cache object with access-order eviction).
"""

from __future__ import annotations

import functools
import hashlib
from collections import OrderedDict
from typing import Any, Callable, Optional

import numpy as np


def hash_array(arr: np.ndarray) -> str:
    """md5 of the raw bytes (reference cache.py:15-25)."""
    arr = np.ascontiguousarray(arr)
    return hashlib.md5(arr.tobytes()).hexdigest()


def hash_args(*args, **kwargs) -> str:
    """Stable hash across arrays and plain values (reference cache.py:28-41)."""
    parts = []
    for a in args:
        if isinstance(a, np.ndarray):
            parts.append(hash_array(a))
        else:
            parts.append(repr(a))
    for k in sorted(kwargs):
        v = kwargs[k]
        parts.append(f"{k}={hash_array(v) if isinstance(v, np.ndarray) else repr(v)}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


class ComputationCache:
    """LRU cache with access-order eviction (reference cache.py:82-147)."""

    def __init__(self, max_size: int = 32):
        self.max_size = max_size
        self._store: "OrderedDict[str, Any]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Optional[Any]:
        if key in self._store:
            self._store.move_to_end(key)
            self.hits += 1
            return self._store[key]
        self.misses += 1
        return None

    def set(self, key: str, value: Any) -> None:
        self._store[key] = value
        self._store.move_to_end(key)
        while len(self._store) > self.max_size:
            self._store.popitem(last=False)

    def invalidate(self, key: str) -> bool:
        return self._store.pop(key, None) is not None

    def clear(self) -> None:
        self._store.clear()
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._store)


_GLOBAL_CACHE = ComputationCache()


def get_cache() -> ComputationCache:
    return _GLOBAL_CACHE


def clear_cache() -> None:
    _GLOBAL_CACHE.clear()


def cached_computation(func: Callable = None, *, cache: Optional[ComputationCache] = None):
    """Decorator caching by content hash of all args (reference cache.py:44-79)."""

    def decorate(f: Callable):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            c = cache or _GLOBAL_CACHE
            key = f"{f.__module__}.{f.__qualname__}:{hash_args(*args, **kwargs)}"
            hit = c.get(key)
            if hit is not None:
                return hit
            result = f(*args, **kwargs)
            c.set(key, result)
            return result

        return wrapper

    if func is not None:
        return decorate(func)
    return decorate
