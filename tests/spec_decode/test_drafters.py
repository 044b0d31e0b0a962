"""Medusa / draft-model / suffix / dynamic-K speculative decoding.

Same invariant as the EAGLE suite: greedy generation with any drafter
equals greedy generation without one (verification gates every draft
against the target's own logits) — plus drafter-specific behavior:
the draft-model drafter with the target itself as the draft gets 100%
acceptance, and suffix decoding drafts from previously generated text.
"""

import numpy as np
import pytest

from vllm_tpu.config import SpeculativeConfig
from vllm_tpu.models import llama

from .test_eagle import make_cfg, run_generate


def test_medusa_greedy_matches_plain():
    from vllm_tpu.spec_decode.medusa import random_medusa_params
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params)

    mcfg = make_cfg(method="medusa", k=3)
    dparams = random_medusa_params(mcfg.model, k=3, seed=5)
    got, spec_steps = run_generate(mcfg, params, draft_params=dparams)
    assert spec_steps > 0, "medusa never proposed drafts"
    assert got == ref


def test_medusa_loader_old_format(tmp_path):
    """Old FasterDecoding layout ({h}.{l}.linear.* / {h}.{N}.weight)
    loads into the blocks/lm_heads schema (ref: medusa.py
    _remap_old_checkpoint_key)."""
    import torch
    from safetensors.torch import save_file

    from vllm_tpu.spec_decode.medusa import load_medusa_params
    cfg = make_cfg().model
    E, V = cfg.hidden_size, cfg.vocab_size
    tensors = {}
    for h in range(2):
        tensors[f"{h}.0.linear.weight"] = torch.randn(E, E)
        tensors[f"{h}.0.linear.bias"] = torch.randn(E)
        tensors[f"{h}.1.weight"] = torch.randn(V, E)
    save_file(tensors, str(tmp_path / "model.safetensors"))
    params = load_medusa_params(str(tmp_path), cfg)
    assert len(params["blocks"]) == 2
    assert params["blocks"][0][0]["weight"].shape == (E, E)
    assert params["lm_heads"][0]["weight"].shape == (E, V)


def test_draft_model_greedy_matches_plain():
    """An independent draft LM drafts; greedy outputs are invariant."""
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params)

    dcfg = make_cfg(method="draft_model", k=3)
    dcfg.speculative.draft_config = dcfg.model
    dparams = llama.random_params(dcfg.model, seed=17)  # a different LM
    got, spec_steps = run_generate(dcfg, params, draft_params=dparams)
    assert spec_steps > 0, "draft model never proposed drafts"
    assert got == ref


def test_draft_model_self_draft_full_acceptance():
    """Target drafting for itself accepts every draft: each greedy step
    emits k+1 tokens, so generation takes far fewer steps."""
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.sample.params import SamplingParams

    k = 3
    cfg = make_cfg(method="draft_model", k=k)
    cfg.speculative.draft_config = cfg.model
    params = llama.random_params(cfg.model, seed=3)
    engine = LLMEngine(cfg, params=params, tokenizer=None,
                       draft_params=params)
    rid = engine.add_request([1, 9, 17, 33],
                             SamplingParams(temperature=0.0,
                                            max_tokens=12,
                                            ignore_eos=True))
    steps, got = 0, []
    while engine.has_unfinished_requests():
        sched = engine.scheduler.schedule()
        outs = engine.scheduler.update_from_output(
            sched, engine.runner.execute_model(sched))
        for o in outs:
            got.extend(o.new_token_ids)
        steps += 1
    assert len(got) == 12
    # Near-full acceptance: far fewer steps than one per token (exact
    # step count tolerates an occasional argmax tie flip between the
    # batched verification and the single-token draft step).
    assert steps <= 8


def test_draft_model_vocab_mismatch_raises():
    import dataclasses

    from vllm_tpu.spec_decode.draft_model import DraftModelProposer
    cfg = make_cfg().model
    bad = dataclasses.replace(cfg, vocab_size=cfg.vocab_size // 2)
    with pytest.raises(ValueError, match="vocab"):
        DraftModelProposer(draft_params={}, dcfg=bad, target_cfg=cfg,
                           k=2, num_kv_blocks=8, block_size=16)


# -- suffix decoding ----------------------------------------------------


def test_suffix_cache_speculates_from_prompt():
    from vllm_tpu.spec_decode.suffix import SuffixDecodingCache
    cache = SuffixDecodingCache(max_tree_depth=8)
    cache.start_request("r", [1, 2, 3, 4, 5, 1, 2, 3])
    # Pattern ends in (1, 2): the prompt tree continues with 3, 4, 5.
    draft = cache.speculate("r", [9, 9, 1, 2], max_spec_tokens=4,
                            max_spec_factor=2.0, min_token_prob=0.0)
    assert draft[:1] == [3]


def test_suffix_cache_global_tree_and_eviction():
    from vllm_tpu.spec_decode.suffix import SuffixDecodingCache
    cache = SuffixDecodingCache(max_tree_depth=8, max_cached_requests=1)
    cache.start_request("a", [])
    cache.add_active_response("a", [7, 8, 9, 7, 8, 9])
    cache.stop_request("a")
    assert "a" in cache.cached_requests
    # A new request sees request a's response through the global tree.
    cache.start_request("b", [0])
    draft = cache.speculate("b", [7, 8], max_spec_tokens=2,
                            max_spec_factor=2.0, min_token_prob=0.0)
    assert draft[:1] == [9]
    # FIFO eviction removes a's counts entirely.
    cache.add_active_response("b", [1, 2])
    cache.stop_request("b")
    assert cache.cached_requests == {"b"}
    cache.start_request("c", [0])
    assert cache.speculate("c", [7, 8], max_spec_tokens=2,
                           max_spec_factor=2.0, min_token_prob=0.0) == []


def test_suffix_spec_factor_limits_draft_length():
    from vllm_tpu.spec_decode.suffix import SuffixDecodingCache
    cache = SuffixDecodingCache(max_tree_depth=16)
    cache.start_request("r", list(range(10)) * 2)
    # Match length 1 (pattern [0] after unseen 99) with factor 1.0
    # caps the draft at one token.
    draft = cache.speculate("r", [99, 0], max_spec_tokens=8,
                            max_spec_factor=1.0, min_token_prob=0.0)
    assert len(draft) <= 1


def test_suffix_greedy_matches_plain():
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params, max_tokens=24)

    scfg = make_cfg(method="suffix", k=3)
    scfg.speculative.suffix_decoding_min_token_prob = 0.0
    got, spec_steps = run_generate(scfg, params, max_tokens=24)
    assert spec_steps > 0, "suffix decoding never proposed drafts"
    assert got == ref


# -- dynamic spec -------------------------------------------------------


def test_dynamic_schedule_lookup():
    from vllm_tpu.spec_decode.dynamic import build_lookup
    lookup = build_lookup([(1, 2, 4), (5, 8, 1)], max_batch_size=10,
                          default_k=3)
    assert lookup[1] == lookup[2] == 4
    assert lookup[3] == lookup[4] == 3  # gap -> default K
    assert lookup[5] == lookup[8] == 1
    assert lookup[9] == lookup[10] == 1  # tail keeps the last range's K


def test_dynamic_schedule_validation():
    from vllm_tpu.spec_decode.dynamic import normalize_schedule
    with pytest.raises(ValueError):
        normalize_schedule([])
    with pytest.raises(ValueError):
        normalize_schedule([(2, 4, 1)])  # must start at 1
    with pytest.raises(ValueError):
        normalize_schedule([(1, 4, 1), (3, 6, 2)])  # overlap
    with pytest.raises(ValueError):
        normalize_schedule([(1, 4, -1)])  # negative K


def test_dynamic_disables_drafting_at_large_batch():
    """With K=0 scheduled for this batch size, no drafts are proposed
    (greedy outputs still match, trivially single-token)."""
    cfg = make_cfg(method="ngram", k=3)
    cfg.speculative.num_speculative_tokens_per_batch_size = [(1, 1, 3),
                                                             (2, 64, 0)]
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params)
    got, spec_steps = run_generate(cfg, params)
    # 3 concurrent requests -> batch size 3 -> K=0 everywhere.
    assert spec_steps == 0
    assert got == ref
