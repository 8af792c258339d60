from latte_tpu.kernels.attention import flash_attention  # noqa: F401
