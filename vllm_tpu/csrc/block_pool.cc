// Native KV block pool: free-list LRU + content-addressed prefix cache.
//
// TPU-native analog of the reference's C++/Rust runtime surface
// (SURVEY §2.8/§2.9): the scheduler's per-step block accounting is
// pure host work on the critical path — at high request rates the
// Python dict/list operations dominate scheduler time. This module
// mirrors vllm_tpu/core/block_pool.py's semantics exactly (parity
// suite: tests/core/test_native_block_pool.py):
//
// - a block is in the free LRU iff ref_cnt == 0
// - free blocks may keep their hash (lazy eviction on reallocation)
// - one canonical block per content hash
// - block 0 is the null block (never allocated, never cached)
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
// Hashes are 64-bit (the Python side passes its hash bytes truncated
// or FNV-folded — collision behavior matches the "builtin" algo tier).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <list>
#include <unordered_map>
#include <vector>

namespace {

struct Block {
  int32_t id;
  int32_t ref_cnt = 0;
  uint64_t hash = 0;
  bool has_hash = false;
  // position in the free LRU (valid iff ref_cnt == 0)
  std::list<int32_t>::iterator lru_it;
  bool in_free = false;
};

struct Pool {
  std::vector<Block> blocks;
  std::list<int32_t> free_lru;  // front = oldest (evict first)
  std::unordered_map<uint64_t, int32_t> cache;  // hash -> canonical id
  bool enable_caching = true;
  // stats
  int64_t queries = 0, hits = 0, evictions = 0;
  // eviction ring: (block_id, hash) pairs drained by Python for the
  // host KV tier (callback-free: ctypes callbacks would re-enter the
  // GIL per eviction).
  std::vector<uint64_t> evict_ring;  // pairs packed [id, hash, ...]
};

void push_free(Pool* p, Block& b) {
  b.lru_it = p->free_lru.insert(p->free_lru.end(), b.id);
  b.in_free = true;
}

void remove_free(Pool* p, Block& b) {
  if (b.in_free) {
    p->free_lru.erase(b.lru_it);
    b.in_free = false;
  }
}

void maybe_evict(Pool* p, Block& b) {
  if (!b.has_hash) return;
  auto it = p->cache.find(b.hash);
  if (it != p->cache.end() && it->second == b.id) {
    p->cache.erase(it);
    p->evictions++;
    p->evict_ring.push_back(static_cast<uint64_t>(b.id));
    p->evict_ring.push_back(b.hash);
  }
  b.has_hash = false;
}

}  // namespace

extern "C" {

Pool* bp_create(int32_t num_blocks, int32_t enable_caching) {
  if (num_blocks < 2) return nullptr;
  Pool* p = new Pool();
  p->enable_caching = enable_caching != 0;
  p->blocks.resize(num_blocks);
  for (int32_t i = 0; i < num_blocks; ++i) p->blocks[i].id = i;
  p->blocks[0].ref_cnt = 1;  // null block
  for (int32_t i = 1; i < num_blocks; ++i) push_free(p, p->blocks[i]);
  return p;
}

void bp_destroy(Pool* p) { delete p; }

int32_t bp_num_free(Pool* p) {
  return static_cast<int32_t>(p->free_lru.size());
}

// Pops n LRU blocks (evicting their cache entries); writes ids to out.
// Returns 0 on success, -1 if not enough free blocks.
int32_t bp_get_new_blocks(Pool* p, int32_t n, int32_t* out) {
  if (n > static_cast<int32_t>(p->free_lru.size())) return -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t id = p->free_lru.front();
    Block& b = p->blocks[id];
    remove_free(p, b);
    maybe_evict(p, b);
    b.ref_cnt = 1;
    out[i] = id;
  }
  return 0;
}

// Takes a reference on cached blocks (prefix-hit path).
void bp_touch(Pool* p, const int32_t* ids, int32_t n) {
  for (int32_t i = 0; i < n; ++i) {
    Block& b = p->blocks[ids[i]];
    if (b.ref_cnt == 0) remove_free(p, b);
    b.ref_cnt++;
  }
}

// Drops references; ref==0 blocks append to the LRU tail in order.
// Returns -1 on double free.
int32_t bp_free_blocks(Pool* p, const int32_t* ids, int32_t n) {
  for (int32_t i = 0; i < n; ++i) {
    if (ids[i] == 0) continue;  // null block
    Block& b = p->blocks[ids[i]];
    if (b.ref_cnt <= 0) return -1;
    if (--b.ref_cnt == 0) push_free(p, b);
  }
  return 0;
}

// Registers hashes for blocks [num_cached, num_full) of a request.
void bp_cache_full_blocks(Pool* p, const int32_t* ids,
                          const uint64_t* hashes, int32_t num_cached,
                          int32_t num_full) {
  if (!p->enable_caching) return;
  for (int32_t i = num_cached; i < num_full; ++i) {
    Block& b = p->blocks[ids[i]];
    if (b.has_hash) continue;
    if (p->cache.count(hashes[i])) continue;
    b.hash = hashes[i];
    b.has_hash = true;
    p->cache[hashes[i]] = b.id;
  }
}

// -1 = miss.
int32_t bp_get_cached_block(Pool* p, uint64_t hash) {
  auto it = p->cache.find(hash);
  return it == p->cache.end() ? -1 : it->second;
}

// Longest-prefix lookup: writes hit block ids to out, returns count.
int32_t bp_lookup_prefix(Pool* p, const uint64_t* hashes, int32_t n,
                         int32_t* out) {
  p->queries += n;
  int32_t i = 0;
  for (; i < n; ++i) {
    auto it = p->cache.find(hashes[i]);
    if (it == p->cache.end()) break;
    out[i] = it->second;
  }
  p->hits += i;
  return i;
}

int32_t bp_reset_prefix_cache(Pool* p) {
  int32_t in_use = static_cast<int32_t>(p->blocks.size()) - 1 -
                   static_cast<int32_t>(p->free_lru.size());
  if (in_use > 0) return 0;
  for (auto& b : p->blocks) b.has_hash = false;
  p->cache.clear();
  return 1;
}

int32_t bp_cache_size(Pool* p) {
  return static_cast<int32_t>(p->cache.size());
}

void bp_stats(Pool* p, int64_t* queries, int64_t* hits,
              int64_t* evictions) {
  *queries = p->queries;
  *hits = p->hits;
  *evictions = p->evictions;
}

void bp_add_stats(Pool* p, int64_t queries, int64_t hits) {
  p->queries += queries;
  p->hits += hits;
}

// Drains up to cap (id, hash) eviction pairs; returns pair count.
int32_t bp_drain_evictions(Pool* p, uint64_t* out, int32_t cap) {
  int32_t n = static_cast<int32_t>(p->evict_ring.size() / 2);
  if (n > cap) n = cap;
  std::memcpy(out, p->evict_ring.data(), n * 2 * sizeof(uint64_t));
  p->evict_ring.erase(p->evict_ring.begin(), p->evict_ring.begin() + n * 2);
  return n;
}

// FNV-1a chained block hash (the native analog of hash_block_tokens).
uint64_t bp_hash_block(uint64_t parent, const int32_t* tokens,
                       int32_t n, uint64_t extra) {
  uint64_t h = 1469598103934665603ULL;
  auto mix = [&h](uint64_t v) {
    for (int i = 0; i < 8; ++i) {
      h ^= (v >> (i * 8)) & 0xFF;
      h *= 1099511628211ULL;
    }
  };
  mix(parent);
  mix(extra);
  for (int32_t i = 0; i < n; ++i) mix(static_cast<uint64_t>(tokens[i]));
  return h;
}

}  // extern "C"
