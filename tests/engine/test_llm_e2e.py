"""End-to-end offline generation vs HF transformers on a tiny model.

Ref analog: tests/basic_correctness in the reference — greedy parity,
batching invariance, stop conditions, seeded sampling determinism.
"""

import numpy as np
import pytest

from vllm_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    import torch
    from transformers import (AutoTokenizer, LlamaConfig, LlamaForCausalLM)
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=32000,  # real tokenizer vocab
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("tiny_e2e"))
    model.save_pretrained(path, safe_serialization=True)
    # Locally trained tokenizer (zero-egress environment).
    from tests.engine.utils import build_tiny_tokenizer
    build_tiny_tokenizer(path)
    return path, model


@pytest.fixture(scope="module")
def llm(tiny_model):
    path, _ = tiny_model
    return LLM(path, dtype="float32", max_model_len=256, block_size=16,
               max_num_seqs=8, max_num_batched_tokens=512,
               num_kv_blocks=129)


def hf_greedy(tiny_model, token_ids, max_new):
    import torch
    _, model = tiny_model
    out = model.generate(torch.tensor([token_ids]), max_new_tokens=max_new,
                         do_sample=False,
                         pad_token_id=0)
    return out[0][len(token_ids):].tolist()


def test_greedy_matches_hf(llm, tiny_model):
    prompt_ids = [1, 306, 626, 263, 4086, 1904]
    outs = llm.generate([prompt_ids],
                        SamplingParams(temperature=0.0, max_tokens=12,
                                       ignore_eos=True))
    got = outs[0].outputs[0].token_ids
    want = hf_greedy(tiny_model, prompt_ids, 12)
    assert got == want


def test_batch_matches_single(llm):
    prompts = [[1, 500 + i * 7, 1000 + i, 42, 17] for i in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    batch = llm.generate(prompts, sp)
    for i, p in enumerate(prompts):
        single = llm.generate([p], sp)
        assert batch[i].outputs[0].token_ids == \
            single[0].outputs[0].token_ids, f"prompt {i}"


def test_text_prompts_and_detokenization(llm):
    outs = llm.generate(["Hello world", "The quick brown fox"],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True))
    for o in outs:
        assert o.finished
        assert len(o.outputs[0].token_ids) == 6
        assert isinstance(o.outputs[0].text, str)
        assert o.outputs[0].finish_reason == "length"


def test_seeded_sampling_deterministic(llm):
    prompt = [1, 77, 88, 99]
    sp = SamplingParams(temperature=0.8, top_p=0.9, seed=1234,
                        max_tokens=10, ignore_eos=True)
    a = llm.generate([prompt], sp)[0].outputs[0].token_ids
    b = llm.generate([prompt], sp)[0].outputs[0].token_ids
    assert a == b
    sp2 = SamplingParams(temperature=0.8, top_p=0.9, seed=4321,
                         max_tokens=10, ignore_eos=True)
    c = llm.generate([prompt], sp2)[0].outputs[0].token_ids
    assert a != c  # overwhelmingly likely


def test_stop_token(llm, tiny_model):
    prompt_ids = [1, 306, 626, 263, 4086, 1904]
    ref = hf_greedy(tiny_model, prompt_ids, 12)
    stop_at = ref[4]
    outs = llm.generate([prompt_ids],
                        SamplingParams(temperature=0.0, max_tokens=12,
                                       ignore_eos=True,
                                       stop_token_ids=[stop_at]))
    got = outs[0].outputs[0].token_ids
    assert got == ref[:5]
    assert outs[0].outputs[0].finish_reason == "stop"
    assert outs[0].outputs[0].stop_reason == stop_at


def test_prefix_cache_reuse_is_correct(llm, tiny_model):
    base = list(range(1, 40))
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    first = llm.generate([base], sp)[0].outputs[0].token_ids
    # Identical prompt again: hits the prefix cache; output must match.
    second = llm.generate([base], sp)[0].outputs[0].token_ids
    assert first == second == hf_greedy(tiny_model, base, 5)
    hits = llm.engine.scheduler.kv_cache_manager.block_pool.stats.hits
    assert hits > 0


def test_max_model_len_guard(tiny_model):
    path, _ = tiny_model
    with pytest.raises(ValueError, match="KV capacity"):
        LLM(path, dtype="float32", max_model_len=256, block_size=16,
            num_kv_blocks=4)


def test_warmup_then_generate(llm):
    """Warmup must leave the engine fully functional and the prefix
    cache empty."""
    llm.engine.warmup()
    pool = llm.engine.scheduler.kv_cache_manager.block_pool
    assert pool.num_free_blocks == pool.num_blocks - 1  # all freed
    assert pool.num_cached_blocks == 0  # no warmup pollution
    outs = llm.generate(["Hello world"],
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
