from latte_tpu.eval.feature_stats import FeatureStats  # noqa: F401
from latte_tpu.eval.metrics import calc_metric, list_metrics  # noqa: F401
