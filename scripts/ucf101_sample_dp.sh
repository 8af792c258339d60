#!/bin/bash
# Mesh data-parallel FVD batch sampling (reference sample/ucf101_ddp.sh equivalent)
python -m latte_tpu.sample.sample_many --config configs/ucf101/ucf101_sample.yaml "$@"
