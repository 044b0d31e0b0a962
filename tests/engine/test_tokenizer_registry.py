"""Tokenizer registry (ref analog: vllm/tokenizers/registry.py)."""

import pytest

from vllm_tpu.engine.tokenizer_registry import (get_tokenizer,
                                                register_tokenizer,
                                                tokenizer_modes)


def test_builtin_modes():
    assert "hf" in tokenizer_modes()
    assert "hf_slow" in tokenizer_modes()


def test_unknown_mode_fails():
    with pytest.raises(ValueError, match="unknown tokenizer mode"):
        get_tokenizer("x", mode="nope")


def test_hf_backend_roundtrip(tmp_path):
    from tests.engine.utils import build_tiny_tokenizer
    build_tiny_tokenizer(str(tmp_path))
    tok = get_tokenizer(str(tmp_path))  # auto -> hf
    ids = tok.encode("hello", add_special_tokens=False)
    assert ids and tok.decode(ids).strip() != ""


def test_oot_registration(tmp_path):
    class FakeTok:
        eos_token_id = 0

        def __init__(self, path):
            self.path = path

        def encode(self, text, add_special_tokens=True):
            return [len(text)]

    register_tokenizer("fake", FakeTok)
    tok = get_tokenizer("some/path", mode="fake")
    assert isinstance(tok, FakeTok) and tok.encode("abc") == [3]


def test_engine_resolves_mode(tmp_path):
    """ModelConfig.tokenizer_mode routes through the registry."""
    from tests.engine.utils import build_tiny_tokenizer
    from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                 SchedulerConfig)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.models import llama
    build_tiny_tokenizer(str(tmp_path))
    mc = ModelConfig(model=str(tmp_path), vocab_size=512, hidden_size=64,
                     intermediate_size=128, num_layers=1, num_heads=4,
                     num_kv_heads=2, max_model_len=64, dtype="float32",
                     tokenizer_mode="hf")
    cfg = EngineConfig(model=mc,
                       cache=CacheConfig(block_size=16, num_gpu_blocks=9),
                       scheduler=SchedulerConfig(
                           max_num_batched_tokens=64, max_num_seqs=2))
    # params supplied (no checkpoint on disk); tokenizer loads from the
    # model path via the registry.
    eng = LLMEngine(cfg, params=llama.random_params(mc, seed=0))
    assert eng.tokenizer is not None
    assert eng.tokenizer.encode("hi", add_special_tokens=False)
