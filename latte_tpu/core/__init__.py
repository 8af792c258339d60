from latte_tpu.core.diffusion import (  # noqa: F401
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
)
from latte_tpu.core.schedules import (  # noqa: F401
    get_named_beta_schedule,
    space_timesteps,
)
