"""Offline test fixtures: a locally trained tiny BPE tokenizer (zero
network egress) compatible with AutoTokenizer."""

from __future__ import annotations

_CORPUS = [
    "Hello world this is a tiny test corpus for the tokenizer.",
    "The quick brown fox jumps over the lazy dog.",
    "TPU native inference engine with paged attention and quantization.",
    "def main(): return 42  # code too",
    "I am a language model trained to generate text token by token.",
    "0 1 2 3 4 5 6 7 8 9 numbers and punctuation , . ! ? ; :",
] * 50


def build_tiny_tokenizer(save_dir: str, vocab_size: int = 2000) -> None:
    """Train a byte-level BPE and save in HF format (offline)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<s>", "</s>", "<unk>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(_CORPUS, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>",
        eos_token="</s>",
        unk_token="<unk>",
    )
    fast.save_pretrained(save_dir)
