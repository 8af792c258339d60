from latte_tpu.text.t5 import T5TextEncoder  # noqa: F401
from latte_tpu.text.clip import FrozenCLIPEmbedder, TextEmbedder  # noqa: F401
