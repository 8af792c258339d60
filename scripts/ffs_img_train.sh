#!/bin/bash
# Joint video+image training (reference train_scripts/ffs_img_train.sh equivalent)
python -m latte_tpu.train.train --config configs/ffs/ffs_img_train.yaml "$@"
