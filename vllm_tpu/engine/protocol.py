"""Engine control-plane wire protocol: msgpack over ZMQ.

Ref analog: the reference's engine boundary — EngineCoreRequest /
EngineCoreOutputs serialized with msgspec-msgpack over ZMQ
(vllm/v1/engine/core_client.py, vllm/v1/serial_utils.py, mirrored by
the Rust crate vllm-engine-core-client). This seam is what makes the
frontend language-neutral and lets a mock engine stand in for tests
(ref: rust/src/mock-engine).

Socket topology (single client): client PUSH -> engine PULL (input),
engine PUSH -> client PULL (output). Frames are
``[type: str, body: msgpack map]``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import msgpack

from vllm_tpu.sample.params import SamplingParams

# Message types
ADD = "add"
ABORT = "abort"
# Dynamic LoRA registration (ref analog: vllm's add_lora RPC on the
# engine-core boundary, v1/engine/core.py add_lora handler).
ADD_LORA = "add_lora"
OUTPUTS = "out"
READY = "ready"
SHUTDOWN = "shutdown"
# DP control plane (ref analog: vllm/v1/engine/coordinator.py wire
# traffic): rank -> coordinator load report; coordinator -> ranks wave
# state broadcast.
REPORT = "report"
WAVE = "wave"


@dataclass
class WireRequest:
    request_id: str
    prompt_token_ids: list[int]
    sampling: dict[str, Any] = field(default_factory=dict)
    priority: int = 0
    lora_name: Optional[str] = None

    def to_sampling_params(self) -> SamplingParams:
        return SamplingParams(**self.sampling)

    @staticmethod
    def from_params(request_id: str, prompt_token_ids: list[int],
                    params: SamplingParams, priority: int = 0,
                    lora_name: Optional[str] = None) -> "WireRequest":
        return WireRequest(request_id, list(prompt_token_ids),
                           dataclasses.asdict(params), priority,
                           lora_name)


@dataclass
class WireOutput:
    request_id: str
    new_token_ids: list[int]
    finished: bool = False
    finish_reason: Optional[str] = None
    stop_reason: Optional[int | str] = None


def encode(msg_type: str, body: Any) -> bytes:
    if dataclasses.is_dataclass(body) and not isinstance(body, type):
        body = dataclasses.asdict(body)
    elif isinstance(body, list):
        body = [
            dataclasses.asdict(b)
            if dataclasses.is_dataclass(b) else b for b in body
        ]
    return msgpack.packb([msg_type, body], use_bin_type=True)


def decode(frame: bytes) -> tuple[str, Any]:
    msg_type, body = msgpack.unpackb(frame, raw=False)
    return msg_type, body
