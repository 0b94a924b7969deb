"""Alias of reference optical_flow/cache.py (LRU computation cache;
reference cache.py:15-161) -> tee_optical_flow_tpu.cache."""

from tee_optical_flow_tpu.cache import (  # noqa: F401
    ComputationCache,
    cached_computation,
    clear_cache,
    get_cache,
    hash_args,
    hash_array,
)

__all__ = ["hash_array", "hash_args", "cached_computation",
           "ComputationCache", "get_cache", "clear_cache"]
