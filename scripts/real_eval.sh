#!/bin/bash
# One-command real-artifact evaluation: published `.pt` checkpoint ->
# transparent conversion -> dp-mesh sampling -> frame extraction -> FVD
# with the real torchscript detectors.
#
# This is the reference's end-to-end acceptance workflow
# (`/root/reference/docs/datasets_evaluation.md:46-53`: sample 2048 videos
# with sample/ffs_ddp.sh, then tools/eval_metrics.sh against the real
# dataset) as a single command per dataset.
#
# usage:
#   scripts/real_eval.sh DATASET CKPT_PT REAL_DIR [OUT_DIR] [METRICS] [N] \
#       [key=value ...]
#
#   DATASET   ffs | sky | taichi | ucf101  (picks configs/DATASET/*_sample.yaml)
#   CKPT_PT   published checkpoint — a reference-format .pt (auto-converted
#             on load, EMA preferred: latte_tpu/train/checkpoint.py find_model)
#             or an orbax checkpoint dir from our trainer
#   REAL_DIR  the real dataset: a directory of .mp4s (auto-extracted to
#             frames) or of per-video frame folders (used as-is)
#   OUT_DIR   work dir (default ./real_eval_DATASET)
#   METRICS   comma list (default fvd2048_16f; see eval/metrics.py for all 7)
#   N         number of generated videos (default 2048)
#   key=value any further args are passed to the sampler as config
#             overrides (e.g. sample_method=ddim num_sampling_steps=ddim50,
#             or model_overrides / vae=tiny for smoke-scale runs)
#
# environment:
#   LATTE_TPU_VAE_CKPT   orbax dir with converted SD VAE decode weights
#                        (tools/convert_vae.py converts the HF diffusers
#                        sd-vae-ft-mse weights once:
#                        python -m latte_tpu.tools.convert_vae SRC DST).
#                        REQUIRED for pixel-space metrics.
#   LATTE_TPU_DETECTORS  directory containing the reference's detector
#                        torchscripts (i3d_torchscript.pt, ...). REQUIRED
#                        for real FVD/IS numbers.
#   LATTE_TPU_DETECTOR_BACKEND  torch (default; exact torchscript on CPU)
#                        or flax (native TPU detectors fed by the converted
#                        torchscript weights — eval/i3d.py, c3d.py)
#   LATTE_TPU_METRIC_ARGS  extra args appended to eval.calc_metrics
#                        (e.g. "--max_real 64 --max_fake 64" for reduced-
#                        budget runs)
#
# Smoke-tested end-to-end with stand-in files shaped like the real ones in
# tests/test_real_eval_script.py (zero-egress image: the literal HF files
# cannot be fetched here).
set -euo pipefail

DATASET="${1:?usage: real_eval.sh DATASET CKPT_PT REAL_DIR [OUT_DIR] [METRICS] [N]}"
CKPT="${2:?missing CKPT_PT}"
REAL_DIR="${3:?missing REAL_DIR}"
OUT_DIR="${4:-./real_eval_${DATASET}}"
METRICS="${5:-fvd2048_16f}"
N="${6:-2048}"
shift $(( $# < 6 ? $# : 6 ))  # remaining args: sampler config overrides

CONFIG="configs/${DATASET}/${DATASET}_sample.yaml"
[ -f "$CONFIG" ] || { echo "no such config: $CONFIG" >&2; exit 2; }
[ -e "$CKPT" ] || { echo "no such checkpoint: $CKPT" >&2; exit 2; }
[ -d "$REAL_DIR" ] || { echo "no such real-data dir: $REAL_DIR" >&2; exit 2; }

mkdir -p "$OUT_DIR"

VAE_OVERRIDE=()
if [ -n "${LATTE_TPU_VAE_CKPT:-}" ]; then
  VAE_OVERRIDE=("vae_ckpt=${LATTE_TPU_VAE_CKPT}")
elif ! grep -q '^vae_ckpt: *[^n ]' "$CONFIG"; then
  echo "WARNING: no VAE weights (set LATTE_TPU_VAE_CKPT to a converted" >&2
  echo "  sd-vae-ft-mse orbax dir); sampling will emit LATENT .npz files" >&2
  echo "  and pixel-space metrics will fail." >&2
fi

echo "== [1/3] sampling ${N} videos (${CONFIG}, ckpt ${CKPT}) =="
python -m latte_tpu.sample.sample_many --config "$CONFIG" \
  --ckpt "$CKPT" --save_video_path "$OUT_DIR/videos" \
  "num_fvd_samples=${N}" "${VAE_OVERRIDE[@]}" "$@"

echo "== [2/3] extracting frames =="
python -m latte_tpu.tools.convert_videos_to_frames \
  -s "$OUT_DIR/videos" -t "$OUT_DIR/fake_frames"

# real side: frame folders pass through; a dir of mp4s gets extracted once
if compgen -G "$REAL_DIR/*.mp4" > /dev/null; then
  if [ ! -d "$OUT_DIR/real_frames" ]; then
    python -m latte_tpu.tools.convert_videos_to_frames \
      -s "$REAL_DIR" -t "$OUT_DIR/real_frames"
  fi
  REAL_PATH="$OUT_DIR/real_frames"
else
  REAL_PATH="$REAL_DIR"
fi

echo "== [3/3] metrics: ${METRICS} =="
if [ -z "${LATTE_TPU_DETECTORS:-}" ]; then
  echo "WARNING: LATTE_TPU_DETECTORS unset — falling back to the stand-in" >&2
  echo "  detector (protocol validation only, NOT comparable numbers)." >&2
  DETECTOR=(--detector "standin:0")
else
  DETECTOR=(--detector auto)
fi
python -m latte_tpu.eval.calc_metrics \
  --real_data_path "$REAL_PATH" --fake_data_path "$OUT_DIR/fake_frames" \
  --metrics "$METRICS" --report_dir "$OUT_DIR/metrics" \
  --cache_dir "$OUT_DIR/cache" "${DETECTOR[@]}" ${LATTE_TPU_METRIC_ARGS:-}

echo "done: reports in $OUT_DIR/metrics"
