"""Quantization: checkpoint formats, schemes, and fused kernels.

The reference's center of gravity (SURVEY.md §2.4): AutoRound/GPTQ/AWQ
WNA16 group quant, online W8A8/FP8, quantized KV cache. TPU-native
shape: one packed device format per scheme + fused Pallas
dequant-GEMMs.
"""
