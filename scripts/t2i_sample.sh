#!/bin/bash
# Text-to-image (reference sample/t2i.sh equivalent)
python -m latte_tpu.sample.sample_t2x --config configs/t2x/t2i_sample.yaml "$@"
