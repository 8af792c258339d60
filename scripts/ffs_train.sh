#!/bin/bash
# Training (reference train_scripts/ffs_train.sh equivalent).
# Multi-host: launch one process per host with JAX_COORDINATOR/NUM_PROCESSES env.
python -m latte_tpu.train.train --config configs/ffs/ffs_train.yaml "$@"
