#!/bin/bash
# Single-chip sampling (reference sample/sky.sh equivalent)
python -m latte_tpu.sample.sample --config configs/sky/sky_sample.yaml "$@"
