#!/bin/bash
# Metric evaluation (reference tools/eval_metrics.sh equivalent)
# usage: eval_metrics.sh REAL_DIR FAKE_DIR [metrics]
python -m latte_tpu.eval.calc_metrics --real_data_path "$1" --fake_data_path "$2" \
    --metrics "${3:-fvd2048_16f}"
