"""g2vlm_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
ushariRanasinghe/G2VLM: feed-forward multi-view 3D reconstruction + spatial-reasoning
VQA with a Mixture-of-Transformers (MoT) Qwen2-VL decoder.

Built from scratch for TPU: single-forward packed prefill with segment-masked
flash attention, preallocated KV caches, static shapes, pjit/GSPMD sharding.
Reference behaviors are cited per-module as /root/reference/<file>:<line>.
"""

__version__ = "0.1.0"
