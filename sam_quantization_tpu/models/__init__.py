from sam_quantization_tpu.models import configs  # noqa: F401
