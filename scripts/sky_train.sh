#!/bin/bash
# Training (reference train_scripts/sky_train.sh equivalent).
# Multi-host: launch one process per host with JAX_COORDINATOR/NUM_PROCESSES env.
python -m latte_tpu.train.train --config configs/sky/sky_train.yaml "$@"
