"""Factories for scheduler tests — no model, no device.

Ref analog: tests/v1/core/utils.py ``create_scheduler():49`` /
``create_requests():208``.
"""

from vllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                             SchedulerConfig)
from vllm_tpu.core.request import Request
from vllm_tpu.core.scheduler import Scheduler
from vllm_tpu.core.sched_output import ModelRunnerOutput, SchedulerOutput
from vllm_tpu.sample.params import SamplingParams


def create_scheduler(
    max_num_seqs: int = 16,
    max_num_batched_tokens: int = 8192,
    num_blocks: int = 1001,
    block_size: int = 16,
    max_model_len: int = 2048,
    enable_prefix_caching: bool = True,
    enable_chunked_prefill: bool = True,
    long_prefill_token_threshold: int = 0,
    policy: str = "fcfs",
) -> Scheduler:
    config = EngineConfig(
        model=ModelConfig(max_model_len=max_model_len),
        cache=CacheConfig(block_size=block_size,
                          enable_prefix_caching=enable_prefix_caching),
        scheduler=SchedulerConfig(
            max_num_batched_tokens=max_num_batched_tokens,
            max_num_seqs=max_num_seqs,
            enable_chunked_prefill=enable_chunked_prefill,
            long_prefill_token_threshold=long_prefill_token_threshold,
            policy=policy,
        ),
    )
    return Scheduler(config, num_blocks=num_blocks)


def create_requests(
    num_requests: int,
    num_tokens: int = 10,
    max_tokens: int = 16,
    same_prompt: bool = False,
) -> list[Request]:
    reqs = []
    for i in range(num_requests):
        base = 0 if same_prompt else i * 1000
        prompt = [base + j for j in range(num_tokens)]
        reqs.append(
            Request(f"req-{i}", prompt,
                    SamplingParams(max_tokens=max_tokens)))
    return reqs


def mock_runner_output(
    scheduler_output: SchedulerOutput,
    token_id: int = 0,
) -> ModelRunnerOutput:
    """Fabricate a ModelRunnerOutput sampling `token_id` for every
    scheduled request."""
    req_ids = list(scheduler_output.num_scheduled_tokens)
    return ModelRunnerOutput(
        req_ids=req_ids,
        sampled_token_ids=[[token_id] for _ in req_ids],
    )
