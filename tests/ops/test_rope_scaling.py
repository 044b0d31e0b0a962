"""Rope scaling variants vs the HF rope-utils reference formulas."""

import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.ops.layers import (rope_inv_freq, yarn_attention_factor)


class _HFCfg:
    def __init__(self, mc: ModelConfig):
        self.rope_theta = mc.rope_theta
        self.hidden_size = mc.hidden_size
        self.num_attention_heads = mc.num_heads
        self.head_dim = mc.head_dim
        self.max_position_embeddings = mc.max_model_len
        self.rope_scaling = mc.rope_scaling
        self.partial_rotary_factor = mc.partial_rotary_factor


def test_yarn_matches_hf():
    from transformers.modeling_rope_utils import _compute_yarn_parameters
    mc = ModelConfig(hidden_size=256, num_heads=4, num_kv_heads=4,
                     max_model_len=8192, rope_theta=10000.0,
                     rope_scaling={
                         "rope_type": "yarn",
                         "factor": 4.0,
                         "original_max_position_embeddings": 2048,
                         "beta_fast": 32,
                         "beta_slow": 1,
                     })
    ref_freq, ref_scale = _compute_yarn_parameters(_HFCfg(mc), "cpu")
    got = np.asarray(rope_inv_freq(mc))
    np.testing.assert_allclose(got, ref_freq.numpy(), rtol=1e-5)
    np.testing.assert_allclose(yarn_attention_factor(mc), ref_scale,
                               rtol=1e-6)


def test_yarn_deepseek_mscale():
    mc = ModelConfig(hidden_size=256, num_heads=4, num_kv_heads=4,
                     max_model_len=8192,
                     rope_scaling={
                         "rope_type": "yarn",
                         "factor": 40.0,
                         "original_max_position_embeddings": 4096,
                         "mscale": 1.0,
                         "mscale_all_dim": 1.0,
                     })
    # mscale == mscale_all_dim => ratio 1.0 (deepseek-v2 convention)
    assert yarn_attention_factor(mc) == 1.0


def test_dynamic_ntk_full_extension():
    from transformers.modeling_rope_utils import (
        _compute_dynamic_ntk_parameters)
    mc = ModelConfig(hidden_size=256, num_heads=4, num_kv_heads=4,
                     max_model_len=2048, rope_theta=10000.0,
                     rope_scaling={"rope_type": "dynamic", "factor": 4.0})
    ref_freq, _ = _compute_dynamic_ntk_parameters(
        _HFCfg(mc), "cpu", seq_len=2048 * 4)
    got = np.asarray(rope_inv_freq(mc))
    np.testing.assert_allclose(got, ref_freq.numpy(), rtol=1e-5)
