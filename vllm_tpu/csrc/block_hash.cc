// Chained FNV-1a-64 block hashing for the prefix cache.
//
// Ref analog: the reference's block hashing hot path
// (vllm/v1/core/kv_cache_utils.py hash_block_tokens) which it keeps
// in optimized form because it runs per admitted block. Here the
// whole request's full-block chain hashes in ONE native call:
// h_i = FNV1a(h_{i-1} bytes || extra || tokens_i as little-endian
// int32 bytes). FNV-1a is process-stable (unlike Python's salted
// hash()), so fnv-mode hashes are valid keys for the cross-process
// tiers (FileKVTier on disk, disagg P/D payload dedup).
//
// Consumed via ctypes (vllm_tpu/core/block_pool.py chain_hashes_fnv);
// the Python fallback implements the identical byte stream, parity-
// tested in tests/core/test_block_hash_native.cc.py.

#include <cstddef>
#include <cstdint>

namespace {
constexpr uint64_t kOffset = 14695981039346656037ULL;
constexpr uint64_t kPrime = 1099511628211ULL;

inline uint64_t fnv_bytes(uint64_t h, const uint8_t* p, int64_t n) {
  for (int64_t i = 0; i < n; ++i) h = (h ^ p[i]) * kPrime;
  return h;
}
}  // namespace

extern "C" {

// tokens: [num_blocks * block_size] int32. out: [num_blocks] u64.
// parent participates for block 0 only when has_parent != 0; later
// blocks chain on the previous output.
void fnv_chain_hashes(uint64_t parent, int32_t has_parent,
                      const int32_t* tokens, int64_t num_blocks,
                      int64_t block_size, const uint8_t* extra,
                      int64_t extra_len, uint64_t* out) {
  uint64_t prev = parent;
  int have_prev = has_parent;
  for (int64_t b = 0; b < num_blocks; ++b) {
    uint64_t h = kOffset;
    if (have_prev) {
      uint8_t pb[8];
      for (int i = 0; i < 8; ++i)
        pb[i] = static_cast<uint8_t>((prev >> (8 * i)) & 0xFF);
      h = fnv_bytes(h, pb, 8);
    }
    if (extra_len > 0) h = fnv_bytes(h, extra, extra_len);
    h = fnv_bytes(
        h, reinterpret_cast<const uint8_t*>(tokens + b * block_size),
        block_size * static_cast<int64_t>(sizeof(int32_t)));
    out[b] = h;
    prev = h;
    have_prev = 1;
  }
}

}  // extern "C"
