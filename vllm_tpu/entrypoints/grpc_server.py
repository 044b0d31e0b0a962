"""gRPC frontend: InferenceService.Generate / GenerateStream.

Ref analog: vllm/entrypoints/grpc_server.py + rust/proto/
inference.proto (Generate/GenerateStream service :10-14). The image
ships grpc + protoc but not the python codegen plugin, so the service
is wired with grpc *generic handlers* over the protoc-generated
message classes (vllm_tpu/proto) — same wire format as stub-generated
code.
"""

from __future__ import annotations

import uuid
from typing import Optional

import grpc

from vllm_tpu.proto import inference_pb2 as pb
from vllm_tpu.sample.params import SamplingParams
from vllm_tpu.utils import init_logger

logger = init_logger(__name__)

_SERVICE = "vllm_tpu.inference.InferenceService"


def _params_from(msg: pb.SamplingParams) -> SamplingParams:
    return SamplingParams(
        temperature=msg.temperature if msg.temperature else 1.0,
        top_p=msg.top_p if msg.top_p else 1.0,
        top_k=msg.top_k,
        max_tokens=msg.max_tokens if msg.max_tokens else 16,
        stop=list(msg.stop) or None,
        ignore_eos=msg.ignore_eos,
        seed=msg.seed if msg.HasField("seed") else None,
    )


def _response(req_id: str, out) -> pb.GenerateResponse:
    c = out.outputs[0]
    return pb.GenerateResponse(
        request_id=req_id,
        text=c.text or "",
        token_ids=list(c.token_ids),
        finished=out.finished,
        finish_reason=c.finish_reason or "",
        prompt_tokens=len(out.prompt_token_ids),
        completion_tokens=len(c.token_ids),
    )


class InferenceServicer:
    """Async service impl over AsyncLLM (one instance per server)."""

    def __init__(self, async_llm) -> None:
        self.llm = async_llm

    def _prompt_of(self, req: pb.GenerateRequest):
        if req.prompt_token_ids:
            return list(req.prompt_token_ids)
        return req.prompt

    async def generate(self, req: pb.GenerateRequest,
                       context) -> pb.GenerateResponse:
        req_id = req.request_id or f"grpc-{uuid.uuid4().hex[:16]}"
        params = _params_from(req.sampling)
        final = None
        async for out in self.llm.generate(
                self._prompt_of(req), params, req_id,
                lora_name=req.lora_name or None):
            final = out
        assert final is not None
        return _response(req_id, final)

    async def generate_stream(self, req: pb.GenerateRequest, context):
        req_id = req.request_id or f"grpc-{uuid.uuid4().hex[:16]}"
        params = _params_from(req.sampling)
        async for out in self.llm.generate(
                self._prompt_of(req), params, req_id,
                lora_name=req.lora_name or None):
            yield _response(req_id, out)

    def handler(self) -> grpc.GenericRpcHandler:
        rpcs = {
            "Generate": grpc.unary_unary_rpc_method_handler(
                self.generate,
                request_deserializer=pb.GenerateRequest.FromString,
                response_serializer=pb.GenerateResponse.SerializeToString,
            ),
            "GenerateStream": grpc.unary_stream_rpc_method_handler(
                self.generate_stream,
                request_deserializer=pb.GenerateRequest.FromString,
                response_serializer=pb.GenerateResponse.SerializeToString,
            ),
        }
        return grpc.method_handlers_generic_handler(_SERVICE, rpcs)


async def serve_grpc(async_llm, host: str = "0.0.0.0",
                     port: int = 50051) -> grpc.aio.Server:
    """Start (and return) the aio gRPC server; caller owns shutdown."""
    server = grpc.aio.server()
    server.add_generic_rpc_handlers(
        (InferenceServicer(async_llm).handler(), ))
    bound = server.add_insecure_port(f"{host}:{port}")
    await server.start()
    logger.info("gRPC InferenceService on %s:%d", host, bound)
    return server


def client_stubs(channel):
    """(generate, generate_stream) callables on a grpc.aio channel —
    stub-free client wiring for the same service."""
    gen = channel.unary_unary(
        f"/{_SERVICE}/Generate",
        request_serializer=pb.GenerateRequest.SerializeToString,
        response_deserializer=pb.GenerateResponse.FromString,
    )
    gen_stream = channel.unary_stream(
        f"/{_SERVICE}/GenerateStream",
        request_serializer=pb.GenerateRequest.SerializeToString,
        response_deserializer=pb.GenerateResponse.FromString,
    )
    return gen, gen_stream
