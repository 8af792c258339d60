#!/bin/bash
# Single-chip sampling (reference sample/taichi.sh equivalent)
python -m latte_tpu.sample.sample --config configs/taichi/taichi_sample.yaml "$@"
