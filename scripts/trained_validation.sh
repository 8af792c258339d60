#!/bin/bash
# Re-validate every serving approximation at TRAINED weights.
#
# Cross-step feature similarity — what block-cache exploits — and
# activation statistics — what the int8 calibration fits — are
# trained-net properties; random-init guards are mechanism checks only.
# This runs the full validation protocol against a real checkpoint:
#
#   1. block-cache operating-point sweep + exact-int8 quality guard at
#      the trained weights (scripts/bench_block_cache.py --ckpt)
#   2. stand-in FVD delta, exact vs int8+block-cache: N videos sampled
#      through each chain from the SAME seeds, frames extracted, FVD
#      against the training data with the deterministic stand-in
#      detector (real torchscripts are egress-blocked here; the DELTA
#      between chains is the signal, not the absolute number)
#
# usage:
#   scripts/trained_validation.sh CKPT REAL_MP4_DIR OUT_DIR [N] [key=value...]
#
#   CKPT          orbax checkpoint dir (or reference .pt) — XL/2 16f 256²
#   REAL_MP4_DIR  the training mp4s (e.g. the make_tiny_dataset output)
#   OUT_DIR       artifact dir (runs/trained_validation in-repo)
#   N             videos per chain (default 64)
#   key=value     extra sampler overrides (both chains)
#
# The checkpoint must match the XL/2 16f 256² serving protocol the sweep
# hardcodes. Produces: OUT_DIR/block_cache_sweep.json, metrics_exact/,
# metrics_cached/, and the sampled videos/frames.
set -euo pipefail

CKPT="${1:?usage: trained_validation.sh CKPT REAL_MP4_DIR OUT_DIR [N]}"
REAL_DIR="${2:?missing REAL_MP4_DIR}"
OUT="${3:?missing OUT_DIR}"
N="${4:-64}"
shift $(( $# < 4 ? $# : 4 ))

mkdir -p "$OUT"

# --raw-params / prefer_ema=false: a few-thousand-step run's 0.9999-decay
# EMA is still mostly init; the raw params are the trained network
echo "== [1/4] block-cache sweep + int8 guard at trained weights =="
python scripts/bench_block_cache.py --ckpt "$CKPT" --raw-params \
  --out "$OUT/block_cache_sweep.json"

SAMPLE_ARGS=(
  model=Latte-XL/2 image_size=256 num_frames=16 extras=1 learn_sigma=true
  sample_method=ddim num_sampling_steps=ddim50 seed=0
  per_proc_batch_size=1 use_fp16=true vae_ckpt=random prefer_ema=false
  "num_fvd_samples=${N}"
)

echo "== [2/4] sampling ${N} videos, EXACT bf16 chain =="
python -m latte_tpu.sample.sample_many --config configs/ffs/ffs_sample.yaml \
  --ckpt "$CKPT" --save_video_path "$OUT/gen_exact" \
  "${SAMPLE_ARGS[@]}" "$@"

echo "== [3/4] sampling ${N} videos, int8 + block-cache chain =="
python -m latte_tpu.sample.sample_many --config configs/ffs/ffs_sample.yaml \
  --ckpt "$CKPT" --save_video_path "$OUT/gen_cached" \
  "${SAMPLE_ARGS[@]}" quantized=static block_cache_interval=2 "$@"

echo "== [4/4] frames + stand-in FVD for both chains =="
python -m latte_tpu.tools.convert_videos_to_frames -s "$REAL_DIR" -t "$OUT/real_frames"
python -m latte_tpu.tools.convert_videos_to_frames -s "$OUT/gen_exact" -t "$OUT/frames_exact"
python -m latte_tpu.tools.convert_videos_to_frames -s "$OUT/gen_cached" -t "$OUT/frames_cached"

for CHAIN in exact cached; do
  python -m latte_tpu.eval.calc_metrics \
    --real_data_path "$OUT/real_frames" --fake_data_path "$OUT/frames_${CHAIN}" \
    --metrics fvd2048_16f --report_dir "$OUT/metrics_${CHAIN}" \
    --cache_dir "$OUT/cache" --detector standin:0 \
    --max_real 512 --max_fake "$N"
done

echo "done: $OUT/block_cache_sweep.json, $OUT/metrics_{exact,cached}/"
