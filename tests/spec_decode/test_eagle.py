"""EAGLE speculative decoding tests.

Key invariant (same as the reference's spec-decode suite): speculative
execution must be output-invariant — greedy generation with any drafter
equals greedy generation without one, because verification gates every
draft against the target's own logits.
"""

import numpy as np

import jax.numpy as jnp

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig, SpeculativeConfig)
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.spec_decode.eagle import (draft_config_from_target,
                                        random_draft_params)


def make_cfg(method=None, k=3) -> EngineConfig:
    return EngineConfig(
        model=ModelConfig(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_model_len=128,
            dtype="float32",
        ),
        cache=CacheConfig(block_size=16, num_gpu_blocks=65),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=4,
                                  multi_step_decode_horizon=1),
        speculative=SpeculativeConfig(method=method,
                                      num_speculative_tokens=k),
    )


def run_generate(cfg, params, draft_params=None, temperature=0.0,
                 max_tokens=12):
    from vllm_tpu.engine.llm_engine import LLMEngine
    engine = LLMEngine(cfg, params=params, tokenizer=None,
                       draft_params=draft_params)
    prompts = [[1, 9, 17, 33, 42, 5, 6, 7], [7, 7, 7],
               [100, 101, 102, 103, 104]]
    ids = [
        engine.add_request(
            p,
            SamplingParams(temperature=temperature, seed=5,
                           max_tokens=max_tokens, ignore_eos=True))
        for p in prompts
    ]
    done: dict[str, list[int]] = {}
    spec_steps = 0
    while engine.has_unfinished_requests():
        sched = engine.scheduler.schedule()
        if sched.scheduled_spec_decode_tokens:
            spec_steps += 1
        runner_out = engine.runner.execute_model(sched)
        outs = engine.scheduler.update_from_output(sched, runner_out)
        for o in outs:
            done.setdefault(o.req_id, []).extend(o.new_token_ids)
    return [done[i] for i in ids], spec_steps


def test_eagle_greedy_matches_plain():
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params)

    ecfg = make_cfg(method="eagle", k=3)
    dcfg = draft_config_from_target(ecfg.model, 1)
    dparams = random_draft_params(dcfg, seed=7)
    got, spec_steps = run_generate(ecfg, params, draft_params=dparams)
    assert spec_steps > 0, "eagle never proposed drafts"
    assert got == ref


def test_eagle3_greedy_matches_plain():
    """EAGLE-3: aux-tap hidden states, 2E-input draft layer, reduced
    draft vocab + d2t mapping — still output-invariant under greedy."""
    from vllm_tpu.spec_decode.eagle import random_eagle3_params
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params)

    ecfg = make_cfg(method="eagle3", k=3)
    dcfg = draft_config_from_target(ecfg.model, 1)
    dparams = random_eagle3_params(dcfg, seed=11, draft_vocab=128)
    got, spec_steps = run_generate(ecfg, params, draft_params=dparams)
    assert spec_steps > 0, "eagle3 never proposed drafts"
    assert got == ref


def test_mtp_greedy_matches_plain():
    """DeepSeek-style MTP module (enorm/hnorm/eh_proj) as drafter."""
    from vllm_tpu.spec_decode.eagle import random_mtp_params
    cfg = make_cfg()
    params = llama.random_params(cfg.model, seed=3)
    ref, _ = run_generate(make_cfg(), params)

    ecfg = make_cfg(method="mtp", k=2)
    dcfg = draft_config_from_target(ecfg.model, 1)
    dparams = random_mtp_params(dcfg, seed=13)
    got, spec_steps = run_generate(ecfg, params, draft_params=dparams)
    assert spec_steps > 0, "mtp never proposed drafts"
    assert got == ref


def test_eagle3_d2t_mapping():
    """Draft ids map to target ids through the d2t offset table."""
    import jax
    from vllm_tpu.spec_decode.eagle import (_draft_next,
                                            random_eagle3_params)
    cfg = make_cfg().model
    dcfg = draft_config_from_target(cfg, 1)
    dparams = random_eagle3_params(dcfg, seed=2, draft_vocab=64)
    h = jnp.asarray(
        np.random.default_rng(0).standard_normal((5, cfg.hidden_size)),
        jnp.float32)
    tok, q = _draft_next(dparams, {}, dcfg, h, None, None, None, 0)
    assert q is None  # reduced-vocab head: point-mass drafts
    tok = np.asarray(jax.device_get(tok))
    logits = h @ np.asarray(dparams["lm_head"]["weight"])
    d = logits.argmax(-1)
    expect = d + np.asarray(dparams["d2t"])[d]
    assert (tok == expect).all()
    assert (tok < cfg.vocab_size).all()


def test_eagle_random_sampling_runs():
    """Stochastic verification path: drafts under temperature>0 go
    through rejection sampling; generation completes and emits the
    requested token counts."""
    cfg = make_cfg(method="eagle", k=2)
    params = llama.random_params(cfg.model, seed=3)
    dparams = random_draft_params(draft_config_from_target(cfg.model, 1),
                                  seed=9)
    outs, _ = run_generate(cfg, params, draft_params=dparams,
                           temperature=0.8)
    assert all(len(o) == 12 for o in outs)
    # Determinism: device-side rejection replays bit-identically.
    outs2, _ = run_generate(cfg, params, draft_params=dparams,
                            temperature=0.8)
    assert outs == outs2


def test_eagle_sampled_emits_draft_probs():
    """EAGLE with the shared target LM head carries the draft
    distributions into verification (the p/q accept-ratio rule; ref:
    rejection_sampler.py draft-probs branch) — the runner's buffer
    must be populated after a drafting step at temperature>0, and
    both accepted and recovered tokens must flow."""
    from vllm_tpu.engine.llm_engine import LLMEngine
    cfg = make_cfg(method="eagle", k=2)
    params = llama.random_params(cfg.model, seed=3)
    dparams = random_draft_params(draft_config_from_target(cfg.model, 1),
                                  seed=9)
    engine = LLMEngine(cfg, params=params, tokenizer=None,
                       draft_params=dparams)
    engine.add_request([1, 9, 17, 33, 42, 5, 6, 7],
                       SamplingParams(temperature=0.8, seed=5,
                                      max_tokens=16, ignore_eos=True))
    accepted_any = False
    saw_probs = False
    spec_steps = 0
    while engine.has_unfinished_requests():
        sched = engine.scheduler.schedule()
        if sched.scheduled_spec_decode_tokens:
            spec_steps += 1
        out = engine.runner.execute_model(sched)
        if engine.runner._draft_probs is not None:
            saw_probs = True
            assert engine.runner._draft_probs.shape[1:] == (
                2, cfg.model.vocab_size)
        if sched.scheduled_spec_decode_tokens and any(
                len(t) > 1 for t in out.sampled_token_ids):
            accepted_any = True
        engine.scheduler.update_from_output(sched, out)
    assert spec_steps > 0 and saw_probs
    assert accepted_any, "ratio rule never accepted a draft"


def test_propose_impl_shapes():
    """Unit: the jitted proposal program returns [R, k] int32 drafts
    and updates the draft caches."""
    from vllm_tpu.spec_decode.eagle import EagleProposer
    from vllm_tpu.worker.runner import StepInputs  # noqa: F401
    cfg = make_cfg().model
    dcfg = draft_config_from_target(cfg, 1)
    dparams = random_draft_params(dcfg, seed=0)
    target = llama.random_params(cfg, seed=1)
    prop = EagleProposer(dparams, dcfg, k=3, num_kv_blocks=17,
                         block_size=16)

    T, R = 16, 4
    import jax

    from vllm_tpu.sample.sampler import SamplingMetadata

    class Inputs:
        input_ids = jnp.asarray(np.arange(T) % 250, jnp.int32)
        positions = jnp.asarray(np.arange(T) % 8, jnp.int32)
        query_start_loc = jnp.asarray([0, 8, 12, 16, 16], jnp.int32)
        seq_lens = jnp.asarray([8, 4, 4, 0], jnp.int32)
        slot_mapping = jnp.asarray(16 + np.arange(T), jnp.int32)
        block_tables = jnp.asarray(
            np.tile(np.arange(1, 9, dtype=np.int32), (R, 1)))
        sampling = SamplingMetadata(
            temperature=jnp.zeros((R, ), jnp.float32),
            top_k=jnp.zeros((R, ), jnp.int32),
            top_p=jnp.ones((R, ), jnp.float32),
            min_p=jnp.zeros((R, ), jnp.float32),
            seeds=jnp.arange(R, dtype=jnp.int32),
            steps=jnp.zeros((R, ), jnp.int32),
        )

    hidden = jnp.asarray(
        np.random.default_rng(0).standard_normal((T, cfg.hidden_size)),
        jnp.float32)
    next_tok = np.array([5, 6, 7, 0], np.int32)
    last_idx = np.array([7, 11, 15, 0], np.int32)
    active = np.array([True, True, True, False])
    before = jax.device_get(prop.draft_caches[0]).copy()
    drafts = prop.propose(target, hidden, Inputs, next_tok, last_idx,
                          active, q_blk=16)
    assert drafts.shape == (R, 3) and drafts.dtype == np.int32
    assert (drafts >= 0).all() and (drafts < cfg.vocab_size).all()
    after = np.asarray(jax.device_get(prop.draft_caches[0]))
    assert not np.array_equal(before, after), "draft cache not written"
