#!/bin/bash
# Training (reference train_scripts/taichi_train.sh equivalent).
# Multi-host: launch one process per host with JAX_COORDINATOR/NUM_PROCESSES env.
python -m latte_tpu.train.train --config configs/taichi/taichi_train.yaml "$@"
