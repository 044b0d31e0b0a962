"""In-repo evaluation corpus for the accuracy gate.

Ref analog: the lm-eval-harness accuracy pins
(.buildkite/lm-eval-harness/configs/*.yaml) gate every (model, quant)
pair on GSM8K; this environment has zero egress, so the gate ships its
own data: a small English text corpus (authored for this repo) plus a
deterministic tokenizer-free token-id fallback. Real checkpoints run
the text through their own tokenizer; the tiny in-repo test
checkpoints (256-token vocab) use the byte fallback.
"""

from __future__ import annotations

# ~2.5 KB of original descriptive prose — enough signal for a stable
# teacher-forced perplexity, small enough to live in the repo.
EVAL_TEXT = """\
The machine room sat at the end of a long corridor, behind a door that
nobody bothered to lock anymore. Inside, rows of accelerators hummed at
a pitch just below hearing, moving numbers through silicon at a pace no
person could follow. Each chip held a grid of multipliers, and each
multiplier did one small thing forever: take two numbers, form their
product, pass it along. Out of that monotony came translation,
summarization, conversation — the strange arithmetic of language.

An engineer named Ada watched the utilization graphs every morning the
way a sailor watches weather. A flat line meant waste; a jagged one
meant contention; the ideal was a high plateau, the sign of a pipeline
fed exactly as fast as it could eat. She had learned the hard way that
the bottleneck was rarely the arithmetic. It was the memory: the slow
crawl of weights from the far banks into the registers, the cache lines
evicted a moment before they were needed again.

So the work became a kind of logistics. Pack the weights tighter.
Stream them in order. Fuse the small operations into the large ones so
nothing touches memory twice. Quantize: store four bits where sixteen
once stood, and spend a little arithmetic to unpack them on the way in.
The products were approximate now, but language is forgiving, and the
error hid below the noise of the model's own uncertainty.

When the batch was large, the machine was glad, because every weight
fetched from memory paid for itself many times over. When a single user
typed a single question, the machine starved, and all the cleverness in
the scheduler went toward keeping it fed: grouping requests, caching
prefixes, guessing the next token before it was asked for and checking
the guess afterward. A good guess cost nothing; a bad one cost only the
check.

At night the room kept working. Requests arrived from time zones where
it was morning, carrying homework and contracts and letters to absent
friends. The scheduler admitted them in order of arrival, split the
long ones into chunks, and promised each a fair share of the budget.
Blocks of cache were lent and reclaimed like library books. Nothing was
kept that could be recomputed more cheaply than stored; nothing was
recomputed that could be looked up.

Ada sometimes thought the whole system resembled a harbor. Ships of
every size, a fixed number of berths, tides of demand, and one simple
rule that kept the chaos honest: no vessel waits forever. The cranes
were fast, but it was the manifest — knowing exactly which container
sat where — that made the harbor work. The manifest, in her world, was
a table of block numbers. She guarded it with tests.
"""


def eval_token_ids(tokenizer=None, vocab_size: int | None = None,
                   max_tokens: int = 2048) -> list[int]:
    """Corpus as token ids.

    With a tokenizer: real encode of EVAL_TEXT (truncated). Without
    (tokenizer-free tiny checkpoints): UTF-8 bytes folded into
    [1, vocab_size-1] — deterministic, text-shaped statistics (byte
    bigrams), no tokenizer needed."""
    if tokenizer is not None:
        ids = tokenizer.encode(EVAL_TEXT)
        return list(ids)[:max_tokens]
    assert vocab_size is not None and vocab_size >= 8
    data = EVAL_TEXT.encode("utf-8")
    return [1 + (b % (vocab_size - 1)) for b in data][:max_tokens]
