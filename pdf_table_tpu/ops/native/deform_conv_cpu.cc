// Modulated deformable convolution v2 — C++ CPU reference.
//
// Parity oracle for the JAX/Pallas implementations (ops/deform_conv.py),
// mirroring the role of the reference's CPU mirrors
// (model/lore/DCNv2_latest/src/cpu/dcn_v2_im2col_cpu.cpp): an independent,
// dependency-free implementation of the same sampling + mask + contraction
// math, exposed via a C ABI for ctypes.
//
// Layout: channels-last (NHWC) like the JAX op.
//   x:      (B, H, W, Cin)
//   offset: (B, Ho, Wo, 2*Kh*Kw)   (dy, dx) per tap
//   mask:   (B, Ho, Wo, Kh*Kw)     post-sigmoid modulation
//   weight: (Kh, Kw, Cin, Cout)
//   out:    (B, Ho, Wo, Cout)

#include <cstdint>
#include <cstring>

extern "C" {

static inline float bilinear(const float* x, int H, int W, int C,
                             float sy, float sx, int c) {
  int y0 = (int)::__builtin_floorf(sy);
  int x0 = (int)::__builtin_floorf(sx);
  float wy = sy - y0, wx = sx - x0;
  float acc = 0.f;
  for (int dy = 0; dy <= 1; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= H) continue;
    float fy = dy ? wy : 1.f - wy;
    for (int dx = 0; dx <= 1; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= W) continue;
      float fx = dx ? wx : 1.f - wx;
      acc += fy * fx * x[((int64_t)yy * W + xx) * C + c];
    }
  }
  return acc;
}

// returns 0 on success
int deform_conv2d_cpu(const float* x, const float* offset, const float* mask,
                      const float* weight, const float* bias, float* out,
                      int B, int H, int W, int Cin, int Kh, int Kw, int Cout,
                      int stride_h, int stride_w, int pad_h, int pad_w,
                      int dil_h, int dil_w) {
  const int Ho = (H + 2 * pad_h - dil_h * (Kh - 1) - 1) / stride_h + 1;
  const int Wo = (W + 2 * pad_w - dil_w * (Kw - 1) - 1) / stride_w + 1;
  const int K = Kh * Kw;
  for (int b = 0; b < B; ++b) {
    const float* xb = x + (int64_t)b * H * W * Cin;
    for (int oy = 0; oy < Ho; ++oy) {
      for (int ox = 0; ox < Wo; ++ox) {
        const int64_t p = (((int64_t)b * Ho + oy) * Wo + ox);
        const float* off = offset + p * 2 * K;
        const float* m = mask + p * K;
        float* o = out + p * Cout;
        for (int co = 0; co < Cout; ++co)
          o[co] = bias ? bias[co] : 0.f;
        for (int ky = 0; ky < Kh; ++ky) {
          for (int kx = 0; kx < Kw; ++kx) {
            const int k = ky * Kw + kx;
            const float sy = oy * stride_h - pad_h + ky * dil_h + off[2 * k];
            const float sx = ox * stride_w - pad_w + kx * dil_w
                             + off[2 * k + 1];
            const float mk = m[k];
            if (mk == 0.f) continue;
            for (int ci = 0; ci < Cin; ++ci) {
              const float v = bilinear(xb, H, W, Cin, sy, sx, ci) * mk;
              if (v == 0.f) continue;
              const float* wrow =
                  weight + (((int64_t)ky * Kw + kx) * Cin + ci) * Cout;
              for (int co = 0; co < Cout; ++co) o[co] += v * wrow[co];
            }
          }
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
