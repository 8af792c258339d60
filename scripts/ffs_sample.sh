#!/bin/bash
# Single-chip sampling (reference sample/ffs.sh equivalent)
python -m latte_tpu.sample.sample --config configs/ffs/ffs_sample.yaml "$@"
