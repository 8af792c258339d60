#!/bin/bash
# Joint video+image training (reference train_scripts/ucf101_img_train.sh equivalent)
python -m latte_tpu.train.train --config configs/ucf101/ucf101_img_train.yaml "$@"
