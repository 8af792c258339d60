from latte_tpu.data.datasets import get_dataset  # noqa: F401
from latte_tpu.data.loader import DataLoader  # noqa: F401
