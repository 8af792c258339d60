from latte_tpu.models.dit import Latte  # noqa: F401
from latte_tpu.models.dit_img import LatteIMG  # noqa: F401
from latte_tpu.models.registry import (  # noqa: F401
    Latte_models,
    LatteIMG_models,
    get_model,
    get_models,
)
