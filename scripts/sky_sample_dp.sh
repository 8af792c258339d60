#!/bin/bash
# Mesh data-parallel FVD batch sampling (reference sample/sky_ddp.sh equivalent)
python -m latte_tpu.sample.sample_many --config configs/sky/sky_sample.yaml "$@"
