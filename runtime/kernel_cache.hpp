// Two-level kernel cache, C++ core.
// (reference: Documentation/CppReference/GEMM/GEMMShaderCache.hpp:14-43 —
// fetchKernel's early-return pipeline probe + library-cache-aware creation;
// design notes on the two cache levels at :14-27.)
//
// Level 1 ("library"): keyed by the kernel/shape-class key — the expensive
// artifact shared across problems of one shape class.
// Level 2 ("pipeline"): keyed by the exact problem — the ready executable.
//
// Unlike the reference's explicitly-not-thread-safe version
// (GEMMShaderCache.hpp:29-35), this one is mutex-guarded: the serving
// scheduler is multi-threaded.
#pragma once

#include <cstdint>
#include <mutex>
#include <unordered_map>

namespace mfa {

struct CacheStats {
  uint64_t library_hits = 0;
  uint64_t library_misses = 0;
  uint64_t pipeline_hits = 0;
  uint64_t pipeline_misses = 0;
};

// Payloads are opaque pointers owned by the cache's client; an optional
// deleter runs on clear() (the reference's caches own their pointers,
// GEMMShaderCache.cpp:21-23).
class TwoLevelCache {
 public:
  using Deleter = void (*)(void*);

  explicit TwoLevelCache(Deleter deleter = nullptr) : deleter_(deleter) {}
  ~TwoLevelCache() { clear(); }

  // Pipeline probe; nullptr on miss (the fetchKernel fast path).
  void* get_pipeline(uint64_t problem_key) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = pipeline_.find(problem_key);
    if (it != pipeline_.end()) {
      ++stats_.pipeline_hits;
      return it->second;
    }
    ++stats_.pipeline_misses;
    return nullptr;
  }

  void* get_library(uint64_t kernel_key) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = library_.find(kernel_key);
    if (it != library_.end()) {
      ++stats_.library_hits;
      return it->second;
    }
    ++stats_.library_misses;
    return nullptr;
  }

  // Insert-if-absent; returns the resident entry (first insert wins, the
  // loser's payload is deleted — mirrors the build-outside-lock race rule
  // of the Python twin, ops/cache.py).
  void* put_library(uint64_t kernel_key, void* payload) {
    return put(library_, kernel_key, payload);
  }
  void* put_pipeline(uint64_t problem_key, void* payload) {
    return put(pipeline_, problem_key, payload);
  }

  CacheStats stats() const {
    std::lock_guard<std::mutex> lock(mu_);
    return stats_;
  }

  void clear() {
    std::lock_guard<std::mutex> lock(mu_);
    if (deleter_) {
      for (auto& kv : pipeline_) deleter_(kv.second);
      // library payloads may alias pipeline payloads in client use; the
      // client chooses a deleter aware of its ownership scheme.
    }
    library_.clear();
    pipeline_.clear();
    stats_ = CacheStats();
  }

 private:
  void* put(std::unordered_map<uint64_t, void*>& map, uint64_t key,
            void* payload) {
    std::lock_guard<std::mutex> lock(mu_);
    auto [it, inserted] = map.emplace(key, payload);
    if (!inserted && payload != it->second && deleter_) deleter_(payload);
    return it->second;
  }

  mutable std::mutex mu_;
  std::unordered_map<uint64_t, void*> library_;
  std::unordered_map<uint64_t, void*> pipeline_;
  CacheStats stats_;
  Deleter deleter_;
};

}  // namespace mfa
