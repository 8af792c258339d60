from latte_tpu.train.state import TrainState, create_train_state  # noqa: F401
from latte_tpu.train.step import make_train_step  # noqa: F401
