// Native host-side data-loader kernels for phendiff-tpu.
//
// The reference delegates its host pipeline to torchvision/PIL + torch
// DataLoader workers (utils_dataset.py:104-118, train.py:160-168).  Here the
// post-decode stages (resize -> normalize -> flip) are a small C++ library
// driven from Python via ctypes, operating on whole batches per call so the
// Python interpreter is out of the per-image loop.  Decode stays in PIL
// (libjpeg/libpng licensing + format zoo); everything after the decode is
// memory-bandwidth work that vectorizes well.
//
// Algorithms:
//  * bilinear resize with half-pixel centers (align_corners=false), plus a
//    triangle-filter (area-weighted) path for downscaling — matching the
//    antialiased behavior of PIL's BILINEAR resampling closely enough for
//    training parity (see tests/test_native.py tolerances).
//  * fused normalize to float32 in [-1, 1] (x / 127.5 - 1).
//  * optional horizontal / vertical flips fused into the output write.
//
// Build: native/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Triangle-filter resample of one channel-interleaved row span.
// Computes output pixel (ox, oy) for all channels.
static inline void sample_bilinear(
    const uint8_t* src, int sh, int sw, int ch,
    float fy, float fx, float* out) {
  int y0 = (int)std::floor(fy);
  int x0 = (int)std::floor(fx);
  float wy1 = fy - y0;
  float wx1 = fx - x0;
  int y1 = std::min(y0 + 1, sh - 1);
  int x1 = std::min(x0 + 1, sw - 1);
  y0 = std::max(y0, 0);
  x0 = std::max(x0, 0);
  const float w00 = (1 - wy1) * (1 - wx1), w01 = (1 - wy1) * wx1;
  const float w10 = wy1 * (1 - wx1), w11 = wy1 * wx1;
  const uint8_t* p00 = src + (y0 * sw + x0) * ch;
  const uint8_t* p01 = src + (y0 * sw + x1) * ch;
  const uint8_t* p10 = src + (y1 * sw + x0) * ch;
  const uint8_t* p11 = src + (y1 * sw + x1) * ch;
  for (int c = 0; c < ch; ++c) {
    out[c] = w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c];
  }
}

// Antialiased (triangle filter with support scaled by the downscale ratio)
// resample for one output pixel.
static inline void sample_triangle(
    const uint8_t* src, int sh, int sw, int ch,
    float cy, float cx, float sy, float sx, float* out) {
  const float ry = std::max(sy, 1.0f);
  const float rx = std::max(sx, 1.0f);
  const int y_lo = (int)std::floor(cy - ry + 0.5f);
  const int y_hi = (int)std::floor(cy + ry + 0.5f);
  const int x_lo = (int)std::floor(cx - rx + 0.5f);
  const int x_hi = (int)std::floor(cx + rx + 0.5f);
  // accumulate directly into `out` (caller-sized: any channel count is
  // safe — no fixed-size stack buffer to overflow)
  for (int c = 0; c < ch; ++c) out[c] = 0.0f;
  float wsum = 0.0f;
  for (int y = y_lo; y < y_hi; ++y) {
    const int yc = std::min(std::max(y, 0), sh - 1);
    const float wy = 1.0f - std::fabs((y + 0.5f - cy) / ry);
    if (wy <= 0) continue;
    for (int x = x_lo; x < x_hi; ++x) {
      const int xc = std::min(std::max(x, 0), sw - 1);
      const float wx = 1.0f - std::fabs((x + 0.5f - cx) / rx);
      if (wx <= 0) continue;
      const float w = wy * wx;
      const uint8_t* p = src + (yc * sw + xc) * ch;
      for (int c = 0; c < ch; ++c) out[c] += w * p[c];
      wsum += w;
    }
  }
  const float inv = wsum > 0 ? 1.0f / wsum : 0.0f;
  for (int c = 0; c < ch; ++c) out[c] *= inv;
}

// Resize one HWC uint8 image to (dh, dw) float32, optionally normalizing to
// [-1, 1] and flipping.  flip_h mirrors the width axis, flip_v the height.
void resize_image_f32(
    const uint8_t* src, int sh, int sw, int ch,
    float* dst, int dh, int dw,
    int normalize, int flip_h, int flip_v, int antialias) {
  const float sy = (float)sh / dh;
  const float sx = (float)sw / dw;
  const bool use_triangle = antialias && (sy > 1.0f || sx > 1.0f);
  // stack buffer for the common small-channel case; heap for wide images
  // (multi-channel microscopy stacks can exceed 16 channels)
  float px_stack[16];
  std::vector<float> px_heap;
  float* px = px_stack;
  if (ch > 16) {
    px_heap.resize(ch);
    px = px_heap.data();
  }
  for (int oy = 0; oy < dh; ++oy) {
    const int ty = flip_v ? (dh - 1 - oy) : oy;
    float* row = dst + (size_t)ty * dw * ch;
    const float cy = (oy + 0.5f) * sy;
    for (int ox = 0; ox < dw; ++ox) {
      const float cx = (ox + 0.5f) * sx;
      if (use_triangle) {
        sample_triangle(src, sh, sw, ch, cy, cx, sy, sx, px);
      } else {
        sample_bilinear(src, sh, sw, ch, cy - 0.5f, cx - 0.5f, px);
      }
      const int tx = flip_h ? (dw - 1 - ox) : ox;
      float* out = row + (size_t)tx * ch;
      if (normalize) {
        for (int c = 0; c < ch; ++c) out[c] = px[c] * (1.0f / 127.5f) - 1.0f;
      } else {
        for (int c = 0; c < ch; ++c) out[c] = px[c];
      }
    }
  }
}

// Batched variant: `n` images with per-image dimensions and flip flags.
// srcs: array of n pointers; dims: n*3 ints (h, w, c per image);
// dst: contiguous [n, dh, dw, ch_out] float32 (ch_out = dims[2] of each,
// required uniform); flips: n*2 ints.
void batch_resize_f32(
    const uint8_t** srcs, const int* dims, int n,
    float* dst, int dh, int dw,
    int normalize, const int* flips, int antialias) {
  const int ch = n > 0 ? dims[2] : 0;
  const size_t stride = (size_t)dh * dw * ch;
  for (int i = 0; i < n; ++i) {
    resize_image_f32(
        srcs[i], dims[i * 3], dims[i * 3 + 1], dims[i * 3 + 2],
        dst + i * stride, dh, dw, normalize,
        flips ? flips[i * 2] : 0, flips ? flips[i * 2 + 1] : 0, antialias);
  }
}

// uint8 resize (for the raw / metrics-reference stream).
void resize_image_u8(
    const uint8_t* src, int sh, int sw, int ch,
    uint8_t* dst, int dh, int dw, int antialias) {
  std::vector<float> tmp((size_t)dh * dw * ch);
  resize_image_f32(src, sh, sw, ch, tmp.data(), dh, dw, 0, 0, 0, antialias);
  for (size_t i = 0; i < tmp.size(); ++i) {
    dst[i] = (uint8_t)std::min(std::max(tmp[i] + 0.5f, 0.0f), 255.0f);
  }
}

}  // extern "C"
