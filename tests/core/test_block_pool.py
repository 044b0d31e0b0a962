"""BlockPool unit tests (device-free).

Modeled on the reference's scheduler-layer test strategy (ref:
tests/v1/core/test_prefix_caching.py) — drive allocation/free/caching
directly, assert ref-counts, LRU order, and eviction.
"""

import pytest

from vllm_tpu.core.block_pool import BlockPool, hash_block_tokens


def test_basic_alloc_free():
    pool = BlockPool(num_blocks=11)
    assert pool.num_free_blocks == 10
    blocks = pool.get_new_blocks(4)
    assert [b.block_id for b in blocks] == [1, 2, 3, 4]
    assert all(b.ref_cnt == 1 for b in blocks)
    assert pool.num_free_blocks == 6
    pool.free_blocks(blocks)
    assert pool.num_free_blocks == 10
    assert all(b.ref_cnt == 0 for b in blocks)


def test_null_block_never_allocated():
    pool = BlockPool(num_blocks=4)
    blocks = pool.get_new_blocks(3)
    assert 0 not in [b.block_id for b in blocks]
    with pytest.raises(RuntimeError):
        pool.get_new_blocks(1)


def test_lru_order_and_eviction():
    pool = BlockPool(num_blocks=6)
    a = pool.get_new_blocks(5)
    # Free in order 3,1,2,4,5 -> LRU order of reuse must match.
    order = [a[2], a[0], a[1], a[3], a[4]]
    pool.free_blocks(order)
    got = pool.get_new_blocks(5)
    assert [b.block_id for b in got] == [b.block_id for b in order]


def test_prefix_cache_hit_and_touch():
    pool = BlockPool(num_blocks=8)
    blocks = pool.get_new_blocks(2)
    h0 = hash_block_tokens(None, tuple(range(16)))
    h1 = hash_block_tokens(h0, tuple(range(16, 32)))
    pool.cache_full_blocks(blocks, [h0, h1], 0, 2)
    assert pool.get_cached_block(h0) is blocks[0]
    assert pool.get_cached_block(h1) is blocks[1]

    # Free: blocks keep their hash while free (lazy eviction).
    pool.free_blocks(blocks)
    assert pool.get_cached_block(h0) is blocks[0]

    # A second request hits and revives them from the free queue.
    hit = [pool.get_cached_block(h0), pool.get_cached_block(h1)]
    pool.touch(hit)
    assert all(b.ref_cnt == 1 for b in hit)
    assert pool.num_free_blocks == 5


def test_eviction_drops_cache_entry():
    pool = BlockPool(num_blocks=3)
    blocks = pool.get_new_blocks(2)
    h0 = hash_block_tokens(None, (1, 2, 3))
    pool.cache_full_blocks(blocks, [h0], 0, 1)
    pool.free_blocks(blocks)
    # Allocating both free blocks evicts the cached one.
    pool.get_new_blocks(2)
    assert pool.get_cached_block(h0) is None
    assert pool.stats.evictions == 1


def test_ref_counting_shared_blocks():
    pool = BlockPool(num_blocks=8)
    blocks = pool.get_new_blocks(1)
    pool.touch(blocks)  # second request shares
    assert blocks[0].ref_cnt == 2
    pool.free_blocks(blocks)
    assert blocks[0].ref_cnt == 1
    assert pool.num_free_blocks == 6  # still held
    pool.free_blocks(blocks)
    assert pool.num_free_blocks == 7


def test_reset_prefix_cache():
    pool = BlockPool(num_blocks=4)
    blocks = pool.get_new_blocks(1)
    h = hash_block_tokens(None, (9,))
    pool.cache_full_blocks(blocks, [h], 0, 1)
    assert not pool.reset_prefix_cache()  # in use
    pool.free_blocks(blocks)
    assert pool.reset_prefix_cache()
    assert pool.get_cached_block(h) is None


def test_hash_chain_depends_on_parent():
    h_a = hash_block_tokens(None, (1, 2))
    h_b = hash_block_tokens(h_a, (3, 4))
    h_c = hash_block_tokens(None, (3, 4))
    assert h_b != h_c
    assert hash_block_tokens(None, (1, 2)) == h_a
    # extra key (e.g. lora) separates content
    assert hash_block_tokens(None, (1, 2), ("lora1",)) != h_a


def test_sha256_hash_algo():
    h = hash_block_tokens(None, (1, 2, 3), None, algo="sha256")
    assert len(h) == 32
    assert h == hash_block_tokens(None, (1, 2, 3), None, algo="sha256")
