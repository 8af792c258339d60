from latte_tpu.config.loader import Config, load_config  # noqa: F401
