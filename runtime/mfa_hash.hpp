// Hash combiners + packers for cache keys.
// (reference: Documentation/CppReference/ccv_nnc_mfa_hash.hpp:10-71 —
// xorshift-distribute combiners and SIMD packers; same role, fresh
// implementation on splitmix64/boost-style combining.)
#pragma once

#include <cstdint>
#include <cstring>

namespace mfa {
namespace hash {

// splitmix64 finalizer: distributes key bits before combining.
inline uint64_t distribute(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

inline void combine_64(uint64_t& seed, uint64_t value) {
  seed ^= distribute(value) + 0x9e3779b97f4a7c15ull + (seed << 6) +
          (seed >> 2);
}

inline void combine_32(uint64_t& seed, uint32_t value) {
  combine_64(seed, static_cast<uint64_t>(value));
}

inline uint64_t pack_64(uint32_t lo, uint32_t hi) {
  return static_cast<uint64_t>(lo) | (static_cast<uint64_t>(hi) << 32);
}

inline uint64_t bytes(const void* data, size_t len, uint64_t seed = 0) {
  const auto* p = static_cast<const uint8_t*>(data);
  // Consume 8-byte words, then the tail.
  while (len >= 8) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    combine_64(seed, w);
    p += 8;
    len -= 8;
  }
  if (len > 0) {
    uint64_t w = 0;
    std::memcpy(&w, p, len);
    combine_64(seed, w | (static_cast<uint64_t>(len) << 56));
  }
  return seed;
}

}  // namespace hash
}  // namespace mfa
