#!/bin/bash
# Joint video+image training (reference train_scripts/taichi_img_train.sh equivalent)
python -m latte_tpu.train.train --config configs/taichi/taichi_img_train.yaml "$@"
