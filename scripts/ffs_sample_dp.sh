#!/bin/bash
# Mesh data-parallel FVD batch sampling (reference sample/ffs_ddp.sh equivalent)
python -m latte_tpu.sample.sample_many --config configs/ffs/ffs_sample.yaml "$@"
