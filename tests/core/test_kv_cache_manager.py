"""KVCacheManager unit tests (device-free)."""

from vllm_tpu.core.kv_cache_manager import KVCacheManager
from vllm_tpu.core.request import Request
from vllm_tpu.sample.params import SamplingParams


def make_request(req_id="r0", prompt=None, n_prompt=48):
    prompt = prompt if prompt is not None else list(range(n_prompt))
    return Request(req_id, prompt, SamplingParams(max_tokens=64))


def test_allocate_and_free():
    mgr = KVCacheManager(num_blocks=17, block_size=16)
    req = make_request(n_prompt=40)
    blocks = mgr.allocate_slots(req, 40)
    assert blocks is not None and len(blocks) == 3  # ceil(40/16)
    assert mgr.get_block_ids(req.request_id) == blocks.get_block_ids()
    mgr.free(req)
    assert mgr.block_pool.num_free_blocks == 16


def test_allocate_insufficient_returns_none():
    mgr = KVCacheManager(num_blocks=3, block_size=16)
    req = make_request(n_prompt=60)
    assert mgr.allocate_slots(req, 60) is None  # needs 4, has 2


def test_incremental_decode_allocation():
    mgr = KVCacheManager(num_blocks=17, block_size=16)
    req = make_request(n_prompt=16)
    first = mgr.allocate_slots(req, 16)
    assert len(first) == 1
    req.num_computed_tokens = 16
    req.append_output_token_ids([7])
    # Decode of token 17 needs a second block.
    second = mgr.allocate_slots(req, 1)
    assert len(second) == 1
    req.num_computed_tokens = 17
    req.append_output_token_ids([8])
    # Token 18 fits in the same block.
    third = mgr.allocate_slots(req, 1)
    assert len(third) == 0


def test_prefix_cache_hit_across_requests():
    mgr = KVCacheManager(num_blocks=33, block_size=16)
    prompt = list(range(48))
    r1 = make_request("r1", prompt)
    blocks, n = mgr.get_computed_blocks(r1)
    assert n == 0
    assert mgr.allocate_slots(r1, 48, blocks) is not None
    r1.num_computed_tokens = 48

    # Same-prompt request hits the 3 full... only 2: 48 tokens = 3 full
    # blocks, but the last-token rule caps hits at num_tokens-1 = 47
    # tokens -> 2 blocks.
    r2 = make_request("r2", list(prompt))
    blocks2, n2 = mgr.get_computed_blocks(r2)
    assert n2 == 32 and len(blocks2) == 2
    assert blocks2.get_block_ids() == mgr.get_block_ids("r1")[:2]
    assert mgr.allocate_slots(r2, 48 - n2, blocks2) is not None
    # Shared blocks now have ref 2.
    assert all(b.ref_cnt == 2 for b in blocks2.blocks)


def test_prefix_cache_partial_hit():
    mgr = KVCacheManager(num_blocks=33, block_size=16)
    r1 = make_request("r1", list(range(32)))
    mgr.allocate_slots(r1, 32)
    r1.num_computed_tokens = 32

    # Same first block, different second.
    r2 = make_request("r2", list(range(16)) + list(range(100, 116)))
    blocks, n = mgr.get_computed_blocks(r2)
    assert n == 16 and len(blocks) == 1


def test_cache_survives_free_and_revives():
    mgr = KVCacheManager(num_blocks=9, block_size=16)
    prompt = list(range(32))
    r1 = make_request("r1", prompt)
    mgr.allocate_slots(r1, 32)
    r1.num_computed_tokens = 32
    mgr.free(r1)

    r2 = make_request("r2", list(prompt) + list(range(200, 208)))
    blocks, n = mgr.get_computed_blocks(r2)
    # Both full blocks of the shared prefix are free but cached.
    assert n == 32


def test_lookahead_slots_not_cached():
    mgr = KVCacheManager(num_blocks=9, block_size=4)
    req = make_request("r", list(range(8)))
    mgr.allocate_slots(req, 8)
    req.num_computed_tokens = 8
    req.append_output_token_ids([1, 2, 3])
    # Verify 3 spec tokens + allocate lookahead: blocks exist but the
    # spec-covered block is not cached.
    mgr.allocate_slots(req, 3, num_lookahead_tokens=2)
    cached = mgr.num_cached_blocks.get("r", 0)
    assert cached <= 11 // 4


def test_free_reverse_order_eviction_priority():
    mgr = KVCacheManager(num_blocks=4, block_size=4)
    r1 = make_request("r1", list(range(12)))
    mgr.allocate_slots(r1, 12)
    r1.num_computed_tokens = 12
    ids = mgr.get_block_ids("r1")
    mgr.free(r1)
    # First block reused should be the request's LAST block (tail
    # evicts first, preserving shared prefixes).
    got = mgr.block_pool.get_new_blocks(1)[0]
    assert got.block_id == ids[-1]
