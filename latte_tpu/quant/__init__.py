from latte_tpu.quant.int8 import (  # noqa: F401
    calibrate_act_amax,
    int8_attention,
    int8_matmul,
    int8_matmul_static,
    int8_matmul_ste,
    merge_amax,
    quantize_params,
    quantize_weight,
)
