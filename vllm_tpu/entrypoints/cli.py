"""CLI: ``python -m vllm_tpu {serve,bench} ...``

Ref analog: the ``vllm`` console script (pyproject.toml:44,
vllm/entrypoints/cli/) with serve + bench subcommands.
"""

from __future__ import annotations

import argparse
import asyncio
import json


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="model path (HF layout)")
    p.add_argument("--max-model-len", type=int, default=2048)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-num-batched-tokens", type=int, default=2048)
    p.add_argument("--num-kv-blocks", type=int, default=None)
    p.add_argument("--quantization", default=None)
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--pipeline-parallel-size", "-pp", type=int, default=1)
    p.add_argument("--pipeline-microbatch-factor", type=int, default=1)
    p.add_argument("--expert-parallel-size", "-ep", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-enable-prefix-caching", action="store_true")
    p.add_argument("--kv-cache-dtype", default="auto",
                   help="auto|bfloat16|fp8|fp8_pth|int8|int4")
    p.add_argument("--host-swap-bytes", type=int, default=0,
                   help="CPU-RAM KV tier size (0 = off)")
    p.add_argument("--otlp-traces-endpoint", default=None)
    p.add_argument("--trace-file", default=None)
    # Speculative decoding: {"method": "ngram"|"eagle", ...} json
    p.add_argument("--speculative-config", default=None)
    p.add_argument("--tokenizer-mode", default="auto",
                   help="auto|hf|hf_slow|tiktoken|<registered>")


def _engine_config(args):
    from vllm_tpu.config import (CacheConfig, EngineConfig,
                                 KVTransferConfig, ObservabilityConfig,
                                 ParallelConfig, SchedulerConfig,
                                 SpeculativeConfig)
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.quant.config import detect_quant_config
    spec = SpeculativeConfig()
    if getattr(args, "speculative_config", None):
        spec = SpeculativeConfig(**json.loads(args.speculative_config))
    model = model_config_from_hf(args.model,
                                 max_model_len=args.max_model_len,
                                 dtype=args.dtype)
    model.tokenizer_mode = getattr(args, "tokenizer_mode", "auto")
    return EngineConfig(
        model=model,
        cache=CacheConfig(
            block_size=args.block_size,
            num_gpu_blocks=args.num_kv_blocks,
            cache_dtype=args.kv_cache_dtype,
            host_swap_bytes=args.host_swap_bytes,
            enable_prefix_caching=not args.no_enable_prefix_caching),
        scheduler=SchedulerConfig(
            max_num_batched_tokens=args.max_num_batched_tokens,
            max_num_seqs=args.max_num_seqs),
        parallel=ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            pipeline_parallel_size=args.pipeline_parallel_size,
            pipeline_microbatch_factor=getattr(
                args, "pipeline_microbatch_factor", 1),
            expert_parallel_size=args.expert_parallel_size),
        quant=detect_quant_config(args.model, args.quantization),
        speculative=spec,
        observability=ObservabilityConfig(
            otlp_traces_endpoint=args.otlp_traces_endpoint,
            trace_file=args.trace_file),
        kv_transfer=KVTransferConfig(
            role=getattr(args, "kv_role", None),
            addr=getattr(args, "kv_addr", None)),
        seed=args.seed,
    )


def cmd_serve(args) -> None:
    from vllm_tpu.engine.async_llm import AsyncLLM
    from vllm_tpu.entrypoints.openai_server import serve
    from vllm_tpu.parallel.mesh import make_mesh

    config = _engine_config(args)
    if args.num_nodes > 1:
        # Multi-host: join the cross-host JAX runtime first so the
        # mesh below spans every node's chips (engine/multihost.py).
        from vllm_tpu.engine.multihost import init_multihost
        if not args.dp_master_addr:
            raise SystemExit("--num-nodes > 1 requires --dp-master-addr")
        init_multihost(args.node_rank, args.num_nodes,
                       args.dp_master_addr)
        if args.node_rank > 0:
            # Headless worker: replay the head's step stream forever.
            from vllm_tpu.engine.multihost import run_worker
            if not args.worker_bind_addr:
                raise SystemExit("worker nodes need --worker-bind-addr")
            mesh = make_mesh(config.parallel)
            run_worker(config, None, config.cache.num_gpu_blocks, mesh,
                       args.worker_bind_addr,
                       hb_addr=getattr(args, "hb_addr", None),
                       rank=args.node_rank - 1)
            return
    if getattr(args, "kv_role", None) == "prefill":
        # Dedicated prefill node: compute prompt KV on demand and ship
        # it to decode engines (ref analog: kv_producer instance,
        # vllm/config/kv_transfer.py). No HTTP API on this role.
        from vllm_tpu.engine.kv_connector import KVPrefillServer
        from vllm_tpu.engine.llm_engine import LLMEngine
        mesh = (make_mesh(config.parallel)
                if config.parallel.world_size > 1 else None)
        engine = LLMEngine(config, mesh=mesh)
        if not args.no_warmup:
            engine.warmup()
        server = KVPrefillServer(engine, args.kv_addr)
        print(f"KV prefill server on {args.kv_addr}")
        while True:
            server.serve_once(timeout_ms=1000)
        return
    mesh = None
    if config.parallel.world_size > 1:
        mesh = make_mesh(config.parallel)
    async_llm = AsyncLLM(config, mesh=mesh,
                         worker_addrs=args.worker_addrs,
                         hb_bind=getattr(args, "hb_bind", None))
    # Register static adapters before warmup so the warmed programs
    # already carry the LoRA stacks (adding one later recompiles).
    for spec in args.lora_modules or []:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--lora-modules wants name=path, got {spec!r}")
        async_llm.add_lora(name, path)
    if not args.no_warmup:
        async_llm.engine.warmup()

    if args.weight_transfer_addr:
        async_llm.enable_weight_transfer(args.weight_transfer_addr)

    async def main():
        async_llm.start()
        grpc_server = None
        if args.grpc_port:
            from vllm_tpu.entrypoints.grpc_server import serve_grpc
            grpc_server = await serve_grpc(async_llm, host=args.host,
                                           port=args.grpc_port)
        await serve(async_llm, host=args.host, port=args.port,
                    model_name=args.served_model_name or args.model,
                    tool_parser=args.tool_call_parser,
                    reasoning_parser=args.reasoning_parser)
        try:
            await asyncio.Event().wait()  # run forever
        finally:
            if grpc_server is not None:
                await grpc_server.stop(grace=None)

    try:
        asyncio.run(main())
    except KeyboardInterrupt:
        pass
    finally:
        async_llm.shutdown()


def cmd_run_batch(args) -> None:
    """Ref analog: vllm run-batch (entrypoints/openai/run_batch.py)."""
    from vllm_tpu.engine.async_llm import AsyncLLM
    from vllm_tpu.entrypoints.run_batch import run_batch

    async_llm = AsyncLLM(_engine_config(args))

    async def main():
        async_llm.start()
        stats = await run_batch(
            async_llm, args.input_file, args.output_file,
            model_name=args.served_model_name or args.model,
            tool_parser=args.tool_call_parser,
            reasoning_parser=args.reasoning_parser)
        print(json.dumps(stats))

    try:
        asyncio.run(main())
    finally:
        async_llm.shutdown()


def cmd_bench(args) -> None:
    from vllm_tpu.benchmarks.run import (bench_latency, bench_serve,
                                         bench_throughput, print_result)
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.engine.llm import LLM

    config = _engine_config(args)
    if args.bench_cmd in ("latency", "throughput"):
        llm = LLM(args.model, engine_config=config)
        if args.bench_cmd == "latency":
            result = bench_latency(llm, args.input_len, args.output_len,
                                   args.iters)
        else:
            result = bench_throughput(llm, args.num_prompts,
                                      args.input_len, args.output_len)
    else:  # serve
        from vllm_tpu.engine.async_llm import AsyncLLM
        async_llm = AsyncLLM(config)
        async_llm.engine.warmup()
        result = bench_serve(async_llm, num_prompts=args.num_prompts,
                             input_len=args.input_len,
                             output_len=args.output_len,
                             request_rate=args.request_rate)
        async_llm.shutdown()
    print_result(args.bench_cmd, result)


def cmd_collect_env(args) -> None:
    import platform

    import jax
    import jaxlib

    import vllm_tpu
    print(f"vllm_tpu: {vllm_tpu.__version__}")
    print(f"python: {platform.python_version()} ({platform.platform()})")
    print(f"jax: {jax.__version__}  jaxlib: {jaxlib.__version__}")
    print(f"backend: {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        lim = stats.get("bytes_limit")
        if lim:
            print(f"hbm: {lim/2**30:.1f} GiB")
    except Exception:
        pass


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="vllm_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    serve_p = sub.add_parser("serve", help="start the OpenAI server")
    _add_engine_args(serve_p)
    serve_p.add_argument("--host", default="0.0.0.0")
    serve_p.add_argument("--port", type=int, default=8000)
    serve_p.add_argument("--served-model-name", default=None)
    serve_p.add_argument("--no-warmup", action="store_true")
    serve_p.add_argument("--grpc-port", type=int, default=0,
                         help="also serve gRPC InferenceService here")
    serve_p.add_argument("--weight-transfer-addr", default=None,
                         help="ZMQ REP addr for RL weight pushes")
    serve_p.add_argument(
        "--tool-call-parser", default=None,
        help="tool-call output parser (hermes, llama3_json, mistral, "
        "pythonic, ...)")
    serve_p.add_argument(
        "--reasoning-parser", default=None,
        help="reasoning-content parser (deepseek_r1, qwen3, gptoss, ...)")
    serve_p.add_argument(
        "--lora-modules", nargs="+", default=None, metavar="NAME=PATH",
        help="static LoRA adapters to serve (PEFT checkpoint dirs); "
        "select per-request via the OpenAI 'model' field")
    # Multi-host (engine/multihost.py; ref analog: parallel.py:141
    # data_parallel_master_ip + headless serve, cli/serve.py:177).
    serve_p.add_argument(
        "--node-rank", type=int, default=0,
        help="this host's rank in the multi-host group (0 = head: "
        "runs the API server + scheduler; >0 = headless worker)")
    serve_p.add_argument(
        "--num-nodes", type=int, default=1,
        help="number of hosts in the jax.distributed group")
    serve_p.add_argument(
        "--dp-master-addr", default=None, metavar="HOST:PORT",
        help="jax.distributed coordinator address (required when "
        "--num-nodes > 1)")
    serve_p.add_argument(
        "--worker-addrs", nargs="+", default=None, metavar="tcp://H:P",
        help="head only: one ZMQ PULL address per worker node, in "
        "node-rank order, where SchedulerOutputs are pushed")
    serve_p.add_argument(
        "--hb-bind", default=None, metavar="tcp://*:P",
        help="head: bind address for worker heartbeats (enables the "
        "worker-death sentinel, engine/multihost.py WorkerSentinel)")
    parser.add_argument(
        "--hb-addr", default=None, metavar="tcp://H:P",
        help="worker: the head's heartbeat address")
    parser.add_argument(
        "--worker-bind-addr", default=None, metavar="tcp://H:P",
        help="worker only: address this node binds for the head's "
        "step stream")
    serve_p.add_argument(
        "--kv-role", default=None, choices=["prefill", "decode"],
        help="disaggregated P/D role: 'prefill' serves prompt KV on "
        "--kv-addr (no HTTP API); 'decode' fetches prompt KV from "
        "--kv-addr before prefilling locally")
    serve_p.add_argument(
        "--kv-addr", default=None, metavar="tcp://H:P",
        help="ZMQ endpoint for the KV connector (bind for prefill "
        "role, connect for decode role)")
    serve_p.set_defaults(fn=cmd_serve)

    bench_p = sub.add_parser("bench", help="run benchmarks")
    rb = sub.add_parser("run-batch",
                        help="run an OpenAI batch file offline")
    _add_engine_args(rb)
    rb.add_argument("-i", "--input-file", required=True)
    rb.add_argument("-o", "--output-file", required=True)
    rb.add_argument("--served-model-name", default=None)
    rb.add_argument("--tool-call-parser", default=None)
    rb.add_argument("--reasoning-parser", default=None)
    rb.set_defaults(fn=cmd_run_batch)

    bench_p.add_argument("bench_cmd",
                         choices=["latency", "throughput", "serve"])
    _add_engine_args(bench_p)
    bench_p.add_argument("--input-len", type=int, default=32)
    bench_p.add_argument("--output-len", type=int, default=128)
    bench_p.add_argument("--iters", type=int, default=8)
    bench_p.add_argument("--num-prompts", type=int, default=64)
    bench_p.add_argument("--request-rate", type=float, default=8.0)
    bench_p.set_defaults(fn=cmd_bench)

    env_p = sub.add_parser("collect-env", help="print environment info")
    env_p.set_defaults(fn=cmd_collect_env)

    args = parser.parse_args(argv)
    args.fn(args)
