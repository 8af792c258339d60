#!/bin/bash
# Training (reference train_scripts/ucf101_train.sh equivalent).
# Multi-host: launch one process per host with JAX_COORDINATOR/NUM_PROCESSES env.
python -m latte_tpu.train.train --config configs/ucf101/ucf101_train.yaml "$@"
