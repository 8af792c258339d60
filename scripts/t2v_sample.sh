#!/bin/bash
# Text-to-video (reference sample/t2v.sh equivalent)
python -m latte_tpu.sample.sample_t2x --config configs/t2x/t2v_sample.yaml "$@"
