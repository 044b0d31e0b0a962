"""gRPC frontend integration (ref analog: rust/proto/inference.proto
Generate/GenerateStream): real AsyncLLM behind a grpc.aio server."""

import asyncio

from vllm_tpu.proto import inference_pb2 as pb


def test_generate_and_stream():
    import grpc

    from tests.entrypoints.test_openai_server import make_async_llm
    from vllm_tpu.entrypoints.grpc_server import client_stubs, serve_grpc

    async def main():
        llm = make_async_llm()
        llm.engine.config.model.eos_token_ids = []
        server = await serve_grpc(llm, host="127.0.0.1", port=50151)
        try:
            async with grpc.aio.insecure_channel("127.0.0.1:50151") as ch:
                gen, gen_stream = client_stubs(ch)
                req = pb.GenerateRequest(
                    request_id="g1",
                    prompt_token_ids=[3, 5, 7, 9],
                    sampling=pb.SamplingParams(temperature=0.0,
                                               max_tokens=6,
                                               ignore_eos=True),
                )
                resp = await gen(req)
                assert resp.finished
                assert len(resp.token_ids) == 6
                assert resp.finish_reason == "length"
                assert resp.prompt_tokens == 4
                assert resp.completion_tokens == 6

                req2 = pb.GenerateRequest(
                    request_id="g2",
                    prompt_token_ids=[2, 4, 6],
                    sampling=pb.SamplingParams(temperature=0.0,
                                               max_tokens=4,
                                               ignore_eos=True),
                )
                frames = [r async for r in gen_stream(req2)]
                assert frames[-1].finished
                assert len(frames[-1].token_ids) == 4
                # streaming yields incrementally growing prefixes
                lens = [len(f.token_ids) for f in frames]
                assert lens == sorted(lens)
        finally:
            await server.stop(None)
            llm.shutdown()

    asyncio.run(main())
