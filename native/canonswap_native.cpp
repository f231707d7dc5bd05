// canonswap_tpu native host library.
//
// The reference ships one native component (a CUDA/C++ multi-scale
// deformable attention extension, SURVEY.md §2c).  The TPU compute path
// replaces the CUDA kernel with a Pallas kernel; this library is the C++
// side of OUR runtime: the host-loop hot spots that sit outside XLA —
// paste-back compositing (affine warp + mask blend fused in one pass over
// the output image) and a CPU ms_deform_attn forward that mirrors the
// reference's cpu extension (ms_deform_attn_cpu.cpp) for parity testing
// and CPU fallback.
//
// Exposed via a plain C ABI and loaded with ctypes
// (canonswap_tpu/runtime/native.py); built by native/build.py with g++.

#include <cstdint>
#include <cmath>
#include <algorithm>
#include <cstring>

extern "C" {

// Fused paste-back: out = clip(mask * warp(crop, M_c2o) + (1-mask) * ori).
//
// crop:  (ch, cw, 3) float32, 0..255 scale
// M:     2x3 row-major crop->original affine
// ori:   (oh, ow, 3) uint8 original frame
// mask:  (oh, ow) float32 in [0, 1] (already in original-frame space)
// out:   (oh, ow, 3) uint8
//
// Matches cv2.warpAffine(INTER_LINEAR, zero border) + numpy blend
// (reference crop.py:523-529) within rounding.
void paste_back(const float* crop, int ch, int cw,
                const float* M, const uint8_t* ori,
                int oh, int ow, const float* mask, uint8_t* out) {
  // invert the 2x3 affine (dst->src mapping)
  const float a = M[0], b = M[1], tx = M[2];
  const float c = M[3], d = M[4], ty = M[5];
  const float det = a * d - b * c;
  const float ia = d / det, ib = -b / det;
  const float ic = -c / det, id = a / det;
  const float itx = -(ia * tx + ib * ty);
  const float ity = -(ic * tx + id * ty);

  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      const float m = mask[y * ow + x];
      const int o = (y * ow + x) * 3;
      if (m <= 0.0f) {
        out[o] = ori[o];
        out[o + 1] = ori[o + 1];
        out[o + 2] = ori[o + 2];
        continue;
      }
      const float sx = ia * x + ib * y + itx;
      const float sy = ic * x + id * y + ity;
      const int x0 = (int)std::floor(sx);
      const int y0 = (int)std::floor(sy);
      const float fx = sx - x0, fy = sy - y0;
      float px[3] = {0.f, 0.f, 0.f};
      for (int dy = 0; dy <= 1; ++dy) {
        const int yy = y0 + dy;
        if (yy < 0 || yy >= ch) continue;
        const float wy = dy ? fy : 1.f - fy;
        for (int dx = 0; dx <= 1; ++dx) {
          const int xx = x0 + dx;
          if (xx < 0 || xx >= cw) continue;
          const float w = wy * (dx ? fx : 1.f - fx);
          const float* p = crop + (yy * cw + xx) * 3;
          px[0] += w * p[0];
          px[1] += w * p[1];
          px[2] += w * p[2];
        }
      }
      for (int k = 0; k < 3; ++k) {
        const float v = m * px[k] + (1.f - m) * (float)ori[o + k];
        out[o + k] = (uint8_t)std::min(255.f, std::max(0.f, std::round(v)));
      }
    }
  }
}

// CPU multi-scale deformable attention forward.
//
// value:   (N, Lin, M, D)       flattened multi-level features
// shapes:  (L, 2)               per-level (H, W)
// loc:     (N, Lq, M, L, P, 2)  sampling locations in [0, 1]
// attn:    (N, Lq, M, L, P)
// out:     (N, Lq, M*D)
//
// align_corners=false, zero padding — identical semantics to the reference
// CUDA kernel / pytorch fallback (ms_deform_attn_func.py:41-71).
void ms_deform_attn_forward(const float* value, const int64_t* shapes,
                            const float* loc, const float* attn,
                            int N, int Lin, int M, int D, int L, int Lq,
                            int P, float* out) {
  // level offsets
  int64_t* offs = new int64_t[L + 1];
  offs[0] = 0;
  for (int l = 0; l < L; ++l) offs[l + 1] = offs[l] + shapes[2 * l] * shapes[2 * l + 1];

  std::memset(out, 0, sizeof(float) * (size_t)N * Lq * M * D);

  for (int n = 0; n < N; ++n) {
    for (int q = 0; q < Lq; ++q) {
      for (int m = 0; m < M; ++m) {
        float* dst = out + (((size_t)n * Lq + q) * M + m) * D;
        for (int l = 0; l < L; ++l) {
          const int H = (int)shapes[2 * l], W = (int)shapes[2 * l + 1];
          for (int p = 0; p < P; ++p) {
            const size_t li =
                ((((size_t)n * Lq + q) * M + m) * L + l) * P + p;
            const float w = attn[li];
            const float sx = loc[li * 2] * W - 0.5f;
            const float sy = loc[li * 2 + 1] * H - 0.5f;
            const int x0 = (int)std::floor(sx);
            const int y0 = (int)std::floor(sy);
            const float fx = sx - x0, fy = sy - y0;
            for (int dy = 0; dy <= 1; ++dy) {
              const int yy = y0 + dy;
              if (yy < 0 || yy >= H) continue;
              const float wy = dy ? fy : 1.f - fy;
              for (int dx = 0; dx <= 1; ++dx) {
                const int xx = x0 + dx;
                if (xx < 0 || xx >= W) continue;
                const float ww = w * wy * (dx ? fx : 1.f - fx);
                const float* src =
                    value + (((size_t)n * Lin + offs[l] + (size_t)yy * W + xx) * M + m) * D;
                for (int k = 0; k < D; ++k) dst[k] += ww * src[k];
              }
            }
          }
        }
      }
    }
  }
  delete[] offs;
}

// Batched uint8 RGB -> float [0,1] conversion (frame-prep hot loop).
void frames_to_float01(const uint8_t* src, int64_t count, float* dst) {
  constexpr float s = 1.0f / 255.0f;
  for (int64_t i = 0; i < count; ++i) dst[i] = src[i] * s;
}

}  // extern "C"
