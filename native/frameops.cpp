// Native host-side frame ops for the rife_tpu video pipeline.
//
// The reference delegates its native work to cuDNN/NCCL/ffmpeg; here the
// TPU handles the math and ffmpeg the codecs, but the host glue --
// uint8 -> float normalization with padding on decode, clamped rounding
// back to uint8 on encode, YUV420 plane conversion -- sits on the
// pipeline's critical path at high fps.  numpy does these at ~1-2 GB/s
// single-threaded; these loops are written to auto-vectorize and are
// threaded across rows.
//
// Built as a plain C ABI shared library (no pybind11 in the image);
// bound via ctypes in rife_tpu/native/__init__.py with a numpy fallback.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void parallel_rows(int h, int threads, void (*fn)(int, int, void*), void* ctx) {
  if (threads <= 1 || h < 64) {
    fn(0, h, ctx);
    return;
  }
  std::vector<std::thread> pool;
  int chunk = (h + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int lo = t * chunk, hi = std::min(h, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=] { fn(lo, hi, ctx); });
  }
  for (auto& th : pool) th.join();
}

struct U8ToF32Ctx {
  const uint8_t* src;
  float* dst;
  int w, c, pad_w;
};

void u8_to_f32_rows(int lo, int hi, void* p) {
  auto* ctx = static_cast<U8ToF32Ctx*>(p);
  const float scale = 1.0f / 255.0f;
  int in_row = ctx->w * ctx->c;
  int out_row = ctx->pad_w * ctx->c;
  for (int y = lo; y < hi; ++y) {
    const uint8_t* s = ctx->src + (size_t)y * in_row;
    float* d = ctx->dst + (size_t)y * out_row;
    for (int i = 0; i < in_row; ++i) d[i] = s[i] * scale;
    for (int i = in_row; i < out_row; ++i) d[i] = 0.0f;
  }
}

struct F32ToU8Ctx {
  const float* src;
  uint8_t* dst;
  int src_w, dst_w, c;
};

void f32_to_u8_rows(int lo, int hi, void* p) {
  auto* ctx = static_cast<F32ToU8Ctx*>(p);
  int in_row = ctx->src_w * ctx->c;
  int out_row = ctx->dst_w * ctx->c;
  for (int y = lo; y < hi; ++y) {
    const float* s = ctx->src + (size_t)y * in_row;
    uint8_t* d = ctx->dst + (size_t)y * out_row;
    for (int i = 0; i < out_row; ++i) {
      float v = s[i] * 255.0f + 0.5f;
      v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
      d[i] = (uint8_t)v;
    }
  }
}

}  // namespace

extern "C" {

// uint8 HWC frame -> float32 [0,1], zero-padded right/bottom to
// (pad_h, pad_w).  dst must hold pad_h*pad_w*c floats.
void rife_u8_to_f32_pad(const uint8_t* src, float* dst, int h, int w, int c,
                        int pad_h, int pad_w, int threads) {
  U8ToF32Ctx ctx{src, dst, w, c, pad_w};
  parallel_rows(h, threads, u8_to_f32_rows, &ctx);
  // bottom padding
  size_t row = (size_t)pad_w * c;
  std::memset(dst + (size_t)h * row, 0, (pad_h - h) * row * sizeof(float));
}

// float32 frame (src_h, src_w, c) -> clamped uint8 crop (dst_h, dst_w, c)
// from the top-left corner.
void rife_f32_to_u8_crop(const float* src, uint8_t* dst, int src_h, int src_w,
                         int dst_h, int dst_w, int c, int threads) {
  F32ToU8Ctx ctx{src, dst, src_w, dst_w, c};
  parallel_rows(dst_h, threads, f32_to_u8_rows, &ctx);
}

// Planar YUV420 (BT.601 full-range, matching skimage yuv2rgb) ->
// interleaved uint8 RGB with bilinear-ish (replicated) chroma upsampling.
void rife_yuv420_to_rgb(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                        uint8_t* rgb, int h, int w) {
  for (int r = 0; r < h; ++r) {
    const uint8_t* yr = y + (size_t)r * w;
    const uint8_t* ur = u + (size_t)(r / 2) * (w / 2);
    const uint8_t* vr = v + (size_t)(r / 2) * (w / 2);
    uint8_t* out = rgb + (size_t)r * w * 3;
    for (int x = 0; x < w; ++x) {
      float Y = yr[x] / 255.0f;
      float U = ur[x / 2] / 255.0f - 0.5f;
      float V = vr[x / 2] / 255.0f - 0.5f;
      float R = Y + 1.13988303f * V;
      float G = Y - 0.394642334f * U - 0.58062185f * V;
      float B = Y + 2.03206185f * U;
      auto clamp = [](float f) {
        f = f * 255.0f + 0.5f;
        return (uint8_t)(f < 0 ? 0 : (f > 255 ? 255 : f));
      };
      out[x * 3 + 0] = clamp(R);
      out[x * 3 + 1] = clamp(G);
      out[x * 3 + 2] = clamp(B);
    }
  }
}

int rife_frameops_version() { return 1; }

}  // extern "C"
