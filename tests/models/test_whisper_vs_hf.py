"""Whisper (encoder-decoder STT) parity vs HF transformers.

Validates the admission-time encoder + per-row cross-KV serving
design (models/whisper.py): encoder states, full decoder logits
through the paged path, engine greedy generate (audio via mm_data),
and the numpy log-mel frontend vs WhisperFeatureExtractor.
Ref analog: vllm whisper tests + entrypoints/openai/speech_to_text.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_whisper(tmp_path_factory):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=256,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        num_mel_bins=80,
        max_source_positions=48,
        max_target_positions=64,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    model = WhisperForConditionalGeneration(cfg).eval().to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_whisper"))
    model.save_pretrained(path, safe_serialization=True)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((80, 96)).astype(np.float32)  # 2F frames
    return path, model, mel


def test_whisper_encoder_matches_hf(tiny_whisper):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import whisper

    path, hf_model, mel = tiny_whisper
    cfg = model_config_from_hf(path, dtype="float32")
    assert cfg.architecture == "WhisperForConditionalGeneration"
    assert cfg.audio["max_source_positions"] == 48
    params = load_llama_params(path, cfg)
    with torch.no_grad():
        hf_enc = hf_model.model.encoder(
            torch.tensor(mel)[None]).last_hidden_state[0].numpy()
    got = np.asarray(whisper.encode_audio(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(got, hf_enc, rtol=2e-4, atol=2e-4)


def test_whisper_decoder_logits_match_hf(tiny_whisper):
    import torch
    from vllm_tpu.loader.hf_config import model_config_from_hf
    from vllm_tpu.loader.safetensors_loader import load_llama_params
    from vllm_tpu.models import whisper
    from vllm_tpu.ops.metadata import AttentionMetadata

    path, hf_model, mel = tiny_whisper
    cfg = model_config_from_hf(path, dtype="float32")
    params = load_llama_params(path, cfg)
    dec_ids = [3, 17, 99, 42, 7]
    T = len(dec_ids)
    with torch.no_grad():
        hf_logits = hf_model(
            input_features=torch.tensor(mel)[None],
            decoder_input_ids=torch.tensor([dec_ids]),
        ).logits[0].numpy()

    caches = whisper.make_caches(cfg, 8, 16, 2, None)
    ks, vs = whisper.encode_cross_kv(params, cfg, jnp.asarray(mel))
    caches = [(p, ck.at[0].set(ks[i]), cv.at[0].set(vs[i]))
              for i, (p, ck, cv) in enumerate(caches)]
    meta = AttentionMetadata(
        slot_mapping=jnp.asarray([32 + i for i in range(T)], jnp.int32),
        block_tables=jnp.asarray([[2, 3], [0, 0]], jnp.int32),
        query_start_loc=jnp.asarray([0, T, T], jnp.int32),
        seq_lens=jnp.asarray([T, 0], jnp.int32),
    )
    hidden, _ = whisper.forward(params, cfg,
                                jnp.asarray(dec_ids, jnp.int32),
                                jnp.arange(T, dtype=jnp.int32),
                                caches, meta)
    logits = whisper.compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=5e-4, atol=5e-4)


def test_whisper_engine_generate(tiny_whisper):
    import torch
    from vllm_tpu import LLM, SamplingParams

    path, hf_model, mel = tiny_whisper
    llm = LLM(path, dtype="float32", max_model_len=32, block_size=16,
              max_num_seqs=2, max_num_batched_tokens=64,
              num_kv_blocks=17)
    start = [3]
    out = llm.generate([start],
                       SamplingParams(temperature=0.0, max_tokens=8),
                       multi_modal_data=[{"audio": mel}])
    # Manual HF greedy loop: version-independent reference (HF
    # whisper generate() post-processes decoder_input_ids prompts).
    ids = list(start)
    with torch.no_grad():
        for _ in range(8):
            lg = hf_model(input_features=torch.tensor(mel)[None],
                          decoder_input_ids=torch.tensor([ids])
                          ).logits[0, -1]
            nxt = int(lg.argmax())
            ids.append(nxt)
            if nxt == 2:  # eos
                break
    assert out[0].outputs[0].token_ids == ids[len(start):]


def test_log_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor
    from vllm_tpu.audio import log_mel_spectrogram

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    want = fe(wav, sampling_rate=16000,
              return_tensors="np").input_features[0]
    got = log_mel_spectrogram(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
