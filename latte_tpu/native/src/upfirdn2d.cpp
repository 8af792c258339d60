// Upsample-FIR-downsample 2D resampling.
//
// Native equivalent of the reference CUDA plugin
// (/root/reference/tools/torch_utils/ops/upfirdn2d.{cpp,cu}): zero-stuff
// upsample by (upy, upx), pad, correlate with a FIR filter, downsample by
// (downy, downx). CPU/OpenMP; the TPU path uses the lax.conv-based
// implementation in latte_tpu/kernels/upfirdn.py.

#include <cstdint>

extern "C" {

// x: (N, C, H, W) contiguous; f: (fh, fw); y: (N, C, OH, OW) with
// OH = (H*upy + pady0 + pady1 - fh) / downy + 1, similarly OW.
void upfirdn2d_f32(const float* x, const float* f, float* y, int64_t n,
                   int64_t c, int64_t h, int64_t w, int64_t fh, int64_t fw,
                   int upx, int upy, int downx, int downy, int padx0,
                   int padx1, int pady0, int pady1, float gain) {
  const int64_t oh = (h * upy + pady0 + pady1 - fh) / downy + 1;
  const int64_t ow = (w * upx + padx0 + padx1 - fw) / downx + 1;
  const int64_t planes = n * c;
#pragma omp parallel for
  for (int64_t p = 0; p < planes; ++p) {
    const float* xin = x + p * h * w;
    float* yout = y + p * oh * ow;
    for (int64_t oy = 0; oy < oh; ++oy) {
      for (int64_t ox = 0; ox < ow; ++ox) {
        // position in the upsampled+padded plane
        const int64_t uy0 = oy * downy - pady0;
        const int64_t ux0 = ox * downx - padx0;
        float acc = 0.f;
        for (int64_t ky = 0; ky < fh; ++ky) {
          const int64_t uy = uy0 + ky;
          if (uy < 0 || uy % upy != 0) continue;
          const int64_t iy = uy / upy;
          if (iy >= h) continue;
          for (int64_t kx = 0; kx < fw; ++kx) {
            const int64_t ux = ux0 + kx;
            if (ux < 0 || ux % upx != 0) continue;
            const int64_t ix = ux / upx;
            if (ix >= w) continue;
            acc += xin[iy * w + ix] * f[ky * fw + kx];
          }
        }
        yout[oy * ow + ox] = acc * gain;
      }
    }
  }
}

}  // extern "C"
