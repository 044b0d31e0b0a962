"""Sleep/wake + save/restore tests (CPU)."""

import numpy as np
import pytest

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.engine.state import (flatten_params, load_state, save_state,
                                   unflatten_params)
from vllm_tpu.models import llama
from vllm_tpu.sample.params import SamplingParams


def make_engine(params=None, seed=31):
    cfg = EngineConfig(
        model=ModelConfig(vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, max_model_len=64,
                          dtype="float32"),
        cache=CacheConfig(block_size=16, num_gpu_blocks=17),
        scheduler=SchedulerConfig(max_num_batched_tokens=128,
                                  max_num_seqs=2),
    )
    params = params or llama.random_params(cfg.model, seed=seed)
    return LLMEngine(cfg, params=params, tokenizer=None), params


def gen(engine, prompt=(1, 5, 9)):
    engine.add_request(list(prompt),
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))
    toks = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                toks = o.outputs[0].token_ids
    return toks


def test_flatten_unflatten_roundtrip():
    import jax.numpy as jnp
    tree = {
        "a": {"weight": jnp.ones((2, 3))},
        "layers": [{"w": jnp.zeros((4, ))}, {"w": jnp.ones((4, ))}],
    }
    flat = flatten_params(tree)
    back = unflatten_params(flat)
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    np.testing.assert_array_equal(back["a"]["weight"],
                                  np.asarray(tree["a"]["weight"]))


def test_sleep_level1_wake_same_results():
    engine, _ = make_engine()
    before = gen(engine)
    engine.sleep(level=1)
    assert engine.is_sleeping
    assert engine.runner.params is None and engine.runner.kv_caches is None
    engine.wake_up()
    assert not engine.is_sleeping
    after = gen(engine)
    assert after == before


def test_sleep_rejects_inflight():
    engine, _ = make_engine()
    engine.add_request([1, 2, 3], SamplingParams(max_tokens=4))
    with pytest.raises(AssertionError):
        engine.sleep()


def test_save_load_state_roundtrip(tmp_path):
    engine, params = make_engine()
    before = gen(engine)
    path = str(tmp_path / "state.safetensors")
    engine.save_state(path)

    # Fresh engine with DIFFERENT weights, then load the saved state.
    engine2, _ = make_engine(seed=99)
    other = gen(engine2)
    assert other != before  # different weights -> different output
    engine2.load_state(path)
    restored = gen(engine2)
    assert restored == before


def test_save_state_bf16(tmp_path):
    import jax.numpy as jnp
    tree = {"w": jnp.ones((8, 8), jnp.bfloat16) * 1.5}
    path = str(tmp_path / "bf16.safetensors")
    save_state(tree, path)
    back = load_state(path)
    assert str(back["w"].dtype) == "bfloat16"
    np.testing.assert_array_equal(np.asarray(back["w"], np.float32), 1.5)
