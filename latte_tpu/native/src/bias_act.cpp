// Fused bias + activation (+gain +clamp) with first-order gradient kernels.
//
// Native equivalent of the reference CUDA plugin
// (/root/reference/tools/torch_utils/ops/bias_act.{cpp,cu}): nine
// activations dispatched by index, optional gain and symmetric clamp,
// plus the gradient kernel used by the custom-VJP wrapper. CPU/OpenMP —
// the TPU compute path uses the XLA/Pallas implementation in
// latte_tpu/kernels/bias_act.py; this library serves host-side pipelines.

#include <cmath>
#include <cstdint>

namespace {

enum Act {
  kLinear = 0,
  kRelu = 1,
  kLrelu = 2,
  kTanh = 3,
  kSigmoid = 4,
  kElu = 5,
  kSelu = 6,
  kSoftplus = 7,
  kSwish = 8,
};

inline float act_fwd(float x, int act, float alpha) {
  switch (act) {
    case kLinear: return x;
    case kRelu: return x > 0 ? x : 0.f;
    case kLrelu: return x > 0 ? x : x * alpha;
    case kTanh: return std::tanh(x);
    case kSigmoid: return 1.f / (1.f + std::exp(-x));
    case kElu: return x >= 0 ? x : std::exp(x) - 1.f;  // alpha fixed at 1
    case kSelu: {
      const float l = 1.0507009873554805f, a = 1.6732632423543772f;
      return x >= 0 ? l * x : l * a * (std::exp(x) - 1.f);
    }
    case kSoftplus: return std::log1p(std::exp(-std::fabs(x))) + (x > 0 ? x : 0.f);
    case kSwish: return x / (1.f + std::exp(-x));
  }
  return x;
}

inline float act_grad(float x, int act, float alpha) {
  // d act(x) / dx
  switch (act) {
    case kLinear: return 1.f;
    case kRelu: return x > 0 ? 1.f : 0.f;
    case kLrelu: return x > 0 ? 1.f : alpha;
    case kTanh: {
      float t = std::tanh(x);
      return 1.f - t * t;
    }
    case kSigmoid: {
      float s = 1.f / (1.f + std::exp(-x));
      return s * (1.f - s);
    }
    case kElu: return x >= 0 ? 1.f : std::exp(x);
    case kSelu: {
      const float l = 1.0507009873554805f, a = 1.6732632423543772f;
      return x >= 0 ? l : l * a * std::exp(x);
    }
    case kSoftplus: return 1.f / (1.f + std::exp(-x));
    case kSwish: {
      float s = 1.f / (1.f + std::exp(-x));
      return s + x * s * (1.f - s);
    }
  }
  return 1.f;
}

}  // namespace

extern "C" {

// y[i] = clamp(gain * act(x[i] + b[(i / stride) % C]))
// b may be null; clamp < 0 disables clamping.
void bias_act_f32(const float* x, const float* b, float* y, int64_t n,
                  int64_t c, int64_t stride, int act, float alpha, float gain,
                  float clamp) {
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i];
    if (b != nullptr) v += b[(i / stride) % c];
    v = act_fwd(v, act, alpha) * gain;
    if (clamp >= 0) v = v < -clamp ? -clamp : (v > clamp ? clamp : v);
    y[i] = v;
  }
}

// dx[i] = dy[i] * gain * act'(x[i] + b[...]); clamp treated as pass-through
// inside the clamped range, zero outside (matching the reference's grad).
void bias_act_grad_f32(const float* dy, const float* x, const float* b,
                       const float* y, float* dx, int64_t n, int64_t c,
                       int64_t stride, int act, float alpha, float gain,
                       float clamp) {
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i];
    if (b != nullptr) v += b[(i / stride) % c];
    float g = act_grad(v, act, alpha) * gain;
    if (clamp >= 0 && (y[i] <= -clamp || y[i] >= clamp)) g = 0.f;
    dx[i] = dy[i] * g;
  }
}

}  // extern "C"
