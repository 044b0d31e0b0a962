"""Typed env-var system (ref analog: vllm/envs.py lazy typed vars)."""

import pytest

from vllm_tpu import envs


def test_defaults():
    assert envs.VLLM_TPU_LOG_LEVEL == "INFO"
    assert envs.VLLM_TPU_NATIVE_POOL is True  # default-on since r4
    assert envs.VLLM_TPU_ATTN_BACKEND is None
    assert envs.VLLM_TPU_BENCH_HORIZON == 64


def test_lazy_reads_respect_runtime_changes(monkeypatch):
    monkeypatch.setenv("VLLM_TPU_NATIVE_POOL", "true")
    assert envs.VLLM_TPU_NATIVE_POOL is True
    monkeypatch.setenv("VLLM_TPU_BENCH_HORIZON", "8")
    assert envs.VLLM_TPU_BENCH_HORIZON == 8
    assert envs.is_set("VLLM_TPU_BENCH_HORIZON")


def test_typo_fails_loudly():
    with pytest.raises(AttributeError):
        envs.VLLM_TPU_DOES_NOT_EXIST


def test_choice_validation(monkeypatch):
    monkeypatch.setenv("VLLM_TPU_ATTN_BACKEND", "cuda")
    with pytest.raises(ValueError):
        envs.VLLM_TPU_ATTN_BACKEND


def test_describe_lists_all():
    d = envs.describe()
    assert "VLLM_TPU_ATTN_BACKEND" in d
    assert set(d) == set(dir(envs)) & {k for k in dir(envs)
                                       if k.startswith("VLLM_")}
