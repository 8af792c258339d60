#!/bin/bash
# Joint video+image training (reference train_scripts/sky_img_train.sh equivalent)
python -m latte_tpu.train.train --config configs/sky/sky_img_train.yaml "$@"
