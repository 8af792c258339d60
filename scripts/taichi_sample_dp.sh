#!/bin/bash
# Mesh data-parallel FVD batch sampling (reference sample/taichi_ddp.sh equivalent)
python -m latte_tpu.sample.sample_many --config configs/taichi/taichi_sample.yaml "$@"
