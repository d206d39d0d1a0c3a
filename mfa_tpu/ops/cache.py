"""Two-level kernel cache.

Recast of the reference's caching architecture
(GEMMDescriptor+PipelineCache.swift:16-19; C++ GEMMShaderCache.hpp:14-27):

- *library cache* — keyed by the kernel (shape-class) descriptor; holds the
  built artifact that is expensive to construct but shape-generic. Here:
  the constructed ``pallas_call`` callable for one block configuration.
- *pipeline cache* — keyed by the exact problem; holds the ready-to-dispatch
  executable. Here: the jitted, shape-specialized function (XLA's
  compilation cache plays the role of the Metal binary archive; like the
  reference we deliberately do not add our own on-disk layer —
  GEMMShaderCache.hpp:22-23 — since JAX's persistent compilation cache
  already exists system-wide).

Unlike the reference's explicitly-not-thread-safe caches
(GEMMShaderCache.hpp:29-35) these are lock-protected: serving runs
multi-threaded schedulers.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


@dataclass
class CacheStats:
    library_hits: int = 0
    library_misses: int = 0
    pipeline_hits: int = 0
    pipeline_misses: int = 0


class TwoLevelCache:
    """Generic two-level (shape-class, exact-problem) memo.

    ``get_pipeline(problem_key, kernel_key, build_kernel, build_pipeline)``:
      1. probe pipeline cache with ``problem_key`` (early return — the
         fast path of GEMMShaderCache::fetchKernel, GEMMShaderCache.cpp:10-19)
      2. on miss, probe/fill library cache with ``kernel_key`` via
         ``build_kernel()``
      3. build the pipeline from the kernel via ``build_pipeline(kernel)``,
         memoize, return.
    """

    def __init__(self, name: str = "cache"):
        self.name = name
        self._library: dict = {}
        self._pipeline: dict = {}
        self._lock = threading.Lock()
        self.stats = CacheStats()

    def get_pipeline(self, problem_key, kernel_key, build_kernel, build_pipeline):
        with self._lock:
            hit = self._pipeline.get(problem_key)
            if hit is not None:
                self.stats.pipeline_hits += 1
                return hit
            self.stats.pipeline_misses += 1
            kernel = self._library.get(kernel_key)
            if kernel is None:
                self.stats.library_misses += 1
            else:
                self.stats.library_hits += 1
        # Build outside the lock: pallas_call construction and jit tracing
        # can be slow; worst case two threads race to build the same entry
        # and one result wins.
        if kernel is None:
            kernel = build_kernel()
        pipeline = build_pipeline(kernel)
        with self._lock:
            self._library.setdefault(kernel_key, kernel)
            pipeline = self._pipeline.setdefault(problem_key, pipeline)
        return pipeline

    def clear(self):
        with self._lock:
            self._library.clear()
            self._pipeline.clear()
            self.stats = CacheStats()

    def evict_if(self, predicate):
        """Drop pipeline AND library entries whose key satisfies
        ``predicate`` (used by the dispatch autotune to evict losing
        candidates' pipelines after a search)."""
        with self._lock:
            for d in (self._pipeline, self._library):
                for key in [k for k in d if predicate(k)]:
                    del d[key]

    def __len__(self):
        return len(self._pipeline)


# Global caches, mirroring the reference's static dictionaries
# (GEMMDescriptor+PipelineCache.swift:16-19).
attention_cache = TwoLevelCache("attention")
gemm_cache = TwoLevelCache("gemm")
