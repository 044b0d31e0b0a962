"""Pipelined multi-step decode (async scheduling x decode horizon).

Horizon N+1 launches off the previous horizon's device-side token
carry before N's outputs reach the host (llm_engine._step_async +
runner._launch_multi_step). Ref analog: the reference overlaps
scheduling with execution via async_scheduling (vllm/v1/core/sched/
async_scheduler.py) and batches decode steps; here both compose.
Invariants: greedy AND seeded-stochastic outputs are bit-identical to
the sync single-step engine; the carry actually engages
(ms_carry_hits > 0); stops and max_tokens mid-horizon are honored."""

import pytest

from tests.engine.test_multi_step import generate, make_engine
from vllm_tpu.config import ModelConfig
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


@pytest.fixture(scope="module")
def params():
    cfg = ModelConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      num_kv_heads=2, max_model_len=128, dtype="float32")
    return llama.random_params(cfg, seed=21)


PROMPTS = [[1, 5, 9, 13], [7, 8], [100, 101, 102]]


def test_pipelined_greedy_parity(params):
    sps = [SamplingParams(temperature=0.0, max_tokens=33,
                          ignore_eos=True)] * 3
    base, _ = generate(make_engine(1, params), PROMPTS, sps)
    eng = make_engine(4, params, async_scheduling=True)
    got, _ = generate(eng, PROMPTS, sps)
    assert [o.token_ids for o in got] == [o.token_ids for o in base]
    # The pipeline actually engaged: at least one horizon launched from
    # the device-side carry (33 tokens / horizon 4 => many horizons).
    assert eng.runner.ms_carry_hits > 0


def test_pipelined_seeded_sampling_parity(params):
    """Seeded stochastic sampling: the RNG step counter advances at
    LAUNCH (not finish), so pipelined horizons must not reuse steps —
    outputs must match the sync engine bit-for-bit."""
    sps = [SamplingParams(temperature=0.8, top_p=0.9, seed=7 + i,
                          max_tokens=25, ignore_eos=True)
           for i in range(3)]
    base, _ = generate(make_engine(1, params), PROMPTS, sps)
    eng = make_engine(4, params, async_scheduling=True)
    got, _ = generate(eng, PROMPTS, sps)
    assert [o.token_ids for o in got] == [o.token_ids for o in base]
    assert eng.runner.ms_carry_hits > 0


def test_pipelined_max_tokens_staggered(params):
    """Requests finish at different horizons mid-pipeline; late device
    outputs for finished requests are dropped, survivors unaffected."""
    sps = [SamplingParams(temperature=0.0, max_tokens=m,
                          ignore_eos=True) for m in (5, 18, 30)]
    base, _ = generate(make_engine(1, params), PROMPTS, sps)
    eng = make_engine(4, params, async_scheduling=True)
    got, _ = generate(eng, PROMPTS, sps)
    assert [o.token_ids for o in got] == [o.token_ids for o in base]


def test_pipelined_new_request_mid_stream(params):
    """A request arriving while horizons are in flight forces the
    fallback (drain, prefill, rebuild carry) without corrupting
    either stream."""
    sps = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    ref_a, _ = generate(make_engine(1, params), [PROMPTS[0]], [sps])
    ref_b, _ = generate(make_engine(1, params), [PROMPTS[1]], [sps])

    eng = make_engine(4, params, async_scheduling=True)
    rid_a = eng.add_request(PROMPTS[0], sps)
    done = {}
    steps = 0
    rid_b = None
    while eng.has_unfinished_requests() or rid_b is None:
        if steps == 4 and rid_b is None:
            rid_b = eng.add_request(PROMPTS[1], sps)
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o.outputs[0].token_ids
        steps += 1
        assert steps < 200
    assert done[rid_a] == ref_a[0].token_ids
    assert done[rid_b] == ref_b[0].token_ids


def test_model_len_cap_inside_horizon(params):
    """A request that reaches max_model_len at a horizon boundary must
    finish LENGTH_CAPPED via the slow path — the bulk-append fast path
    must not let it schedule past the model length (review finding:
    block-table overflow / learned-position OOB)."""
    sps = [SamplingParams(temperature=0.0, max_tokens=1000,
                          ignore_eos=True)]
    for prompt in ([1, 5, 9, 13], [7] * 6):
        eng = make_engine(8, params, async_scheduling=True)
        got, _ = generate(eng, [prompt], sps)
        # max_model_len=128 in make_engine's config.
        assert len(prompt) + len(got[0].token_ids) == 128
        ref_eng = make_engine(1, params)
        ref, _ = generate(ref_eng, [prompt], sps)
        assert got[0].token_ids == ref[0].token_ids
