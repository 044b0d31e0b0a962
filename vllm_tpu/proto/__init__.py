"""Protocol buffers for the gRPC frontend.

``inference_pb2.py`` is generated from ``inference.proto`` with
``protoc --python_out=.`` (checked in: the image ships protoc but not
the grpc python codegen plugin; service wiring uses grpc generic
handlers instead of generated stubs — see entrypoints/grpc_server.py).
Regenerate after editing the proto:

    cd vllm_tpu/proto && protoc --python_out=. inference.proto
"""

from vllm_tpu.proto import inference_pb2  # noqa: F401
