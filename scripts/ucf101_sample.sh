#!/bin/bash
# Single-chip sampling (reference sample/ucf101.sh equivalent)
python -m latte_tpu.sample.sample --config configs/ucf101/ucf101_sample.yaml "$@"
