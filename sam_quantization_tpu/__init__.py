"""sam_quantization_tpu — a TPU-native quantized-inference framework for SAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``zhanglei1172/sam-quantization`` (GPU/PyTorch/Triton): FP SAM (ViT-B/L/H),
GPTQ weight-only quantization, FQ-ViT full PTQ (power-of-two-factor int
LayerNorm + log-int-softmax), RTN baselines, fused Pallas kernels
(dequant-matmul, windowed flash attention with decomposed rel-pos, fused
quantized MLP), an interactive click-loop evaluation harness, and multi-chip
scaling via ``jax.sharding`` meshes.

The compute path is pure JAX: models are pytrees of parameters plus pure
``apply`` functions, quantization is a functional transform over the pytree,
and all hot ops lower to MXU-friendly XLA or hand-written Pallas kernels.
"""

__version__ = "0.1.0"

from sam_quantization_tpu.models.build_sam import (  # noqa: F401
    build_sam_vit_b,
    build_sam_vit_h,
    build_sam_vit_l,
    sam_model_registry,
)
