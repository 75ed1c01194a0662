from sam_quantization_tpu.nn import functional, packed  # noqa: F401
from sam_quantization_tpu.nn.packed import PackedLinear  # noqa: F401
