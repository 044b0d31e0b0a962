"""Engine-core outputs -> detokenized RequestOutputs + stop-string
aborts.

Ref analog: vllm/v1/engine/output_processor.py (OutputProcessor:429).
Stop strings can only be detected after detokenization, so the
processor reports which requests must be aborted back into the
scheduler (the reference does the same round-trip).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from vllm_tpu.core.sched_output import EngineCoreOutput
from vllm_tpu.engine.detokenizer import IncrementalDetokenizer
from vllm_tpu.engine.outputs import CompletionOutput, RequestOutput
from vllm_tpu.sample.params import SamplingParams


@dataclass
class RequestState:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: list[int]
    detokenizer: Optional[IncrementalDetokenizer]
    sampling_params: SamplingParams
    output_token_ids: list[int]
    logprobs: Optional[list[dict[int, float]]] = None
    prompt_logprobs: Optional[list] = None


class OutputProcessor:

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer
        self.states: dict[str, RequestState] = {}

    def add_request(self, request_id: str, prompt: Optional[str],
                    prompt_token_ids: list[int],
                    params: SamplingParams) -> None:
        detok = None
        if params.detokenize and self.tokenizer is not None:
            detok = IncrementalDetokenizer(
                self.tokenizer, prompt_token_ids, list(params.stop or []),
                params.include_stop_str_in_output)
        self.states[request_id] = RequestState(
            request_id, prompt, prompt_token_ids, detok, params, [],
            logprobs=[] if params.logprobs else None)

    def abort(self, request_id: str) -> None:
        self.states.pop(request_id, None)

    def process_outputs(
        self, outputs: list[EngineCoreOutput]
    ) -> tuple[list[RequestOutput], list[str]]:
        """Returns (request outputs, req_ids to abort on stop-string)."""
        results: list[RequestOutput] = []
        to_abort: list[str] = []
        for eco in outputs:
            state = self.states.get(eco.req_id)
            if state is None:
                continue
            state.output_token_ids.extend(eco.new_token_ids)
            if state.logprobs is not None and eco.new_logprobs:
                state.logprobs.extend(eco.new_logprobs)
            if eco.prompt_logprobs is not None:
                state.prompt_logprobs = eco.prompt_logprobs
            finished = eco.finished
            finish_reason = eco.finish_reason
            stop_reason = eco.stop_reason

            text = ""
            if state.detokenizer is not None:
                stop_hit = state.detokenizer.update(eco.new_token_ids)
                if stop_hit is not None and not finished:
                    finished = True
                    finish_reason = "stop"
                    stop_reason = stop_hit
                    to_abort.append(eco.req_id)
                # Streaming consumers diff consecutive `text` values, so
                # hold back stop_buffer chars until finish: a partially
                # formed stop string must never be streamed out (the
                # final update() truncation would otherwise shrink text
                # below what was already sent).
                text = state.detokenizer.get_next_output_text(
                    buffered=True, finished=finished)

            results.append(
                RequestOutput(
                    request_id=eco.req_id,
                    prompt=state.prompt,
                    prompt_token_ids=state.prompt_token_ids,
                    outputs=[
                        CompletionOutput(
                            index=0,
                            text=text,
                            token_ids=list(state.output_token_ids),
                            finish_reason=finish_reason,
                            stop_reason=stop_reason,
                            cumulative_logprob=(sum(
                                lp[t] for lp, t in zip(
                                    state.logprobs,
                                    state.output_token_ids)
                                if t in lp) if state.logprobs else None),
                            logprobs=(list(state.logprobs)
                                      if state.logprobs is not None
                                      else None),
                        )
                    ],
                    finished=finished,
                    embedding=eco.pooling_output,
                    prompt_logprobs=state.prompt_logprobs,
                ))
            if finished:
                self.states.pop(eco.req_id, None)
        return results, to_abort
