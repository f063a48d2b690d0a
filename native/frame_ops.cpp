// Native frame preprocessing for the video data path.
//
// The reference's data loader leans on OpenCV/decord C++ kernels for frame
// handling (LVM/train_helper/data.py:16-17, inference driver:13-14). This
// library is the framework's own native preprocessing stage: fused
// aspect-preserving cover-resize + center-crop + [-1,1] normalisation from
// decoded RGB bytes straight into the float buffer the VAE consumes, batched
// and threaded across frames. Exposed as a C ABI for ctypes (no pybind11 in
// the image).
//
// Build: make -C native   ->  native/libvgt_frame_ops.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear sample of channel c at (y, x) from an HxWx3 uint8 image.
inline float sample(const uint8_t* src, int h, int w, float y, float x,
                    int c) {
  y = std::min(std::max(y, 0.0f), static_cast<float>(h - 1));
  x = std::min(std::max(x, 0.0f), static_cast<float>(w - 1));
  const int y0 = static_cast<int>(y);
  const int x0 = static_cast<int>(x);
  const int y1 = std::min(y0 + 1, h - 1);
  const int x1 = std::min(x0 + 1, w - 1);
  const float fy = y - y0;
  const float fx = x - x0;
  const float v00 = src[(y0 * w + x0) * 3 + c];
  const float v01 = src[(y0 * w + x1) * 3 + c];
  const float v10 = src[(y1 * w + x0) * 3 + c];
  const float v11 = src[(y1 * w + x1) * 3 + c];
  const float top = v00 + (v01 - v00) * fx;
  const float bot = v10 + (v11 - v10) * fx;
  return top + (bot - top) * fy;
}

// Area (box) average over the source rectangle [y0, y1) x [x0, x1) — the
// anti-aliased kernel for minification (matches cv2 INTER_AREA semantics).
inline void box_average(const uint8_t* src, int h, int w, float y0, float y1,
                        float x0, float x1, float out[3]) {
  y0 = std::max(y0, 0.0f);
  x0 = std::max(x0, 0.0f);
  y1 = std::min(y1, static_cast<float>(h));
  x1 = std::min(x1, static_cast<float>(w));
  const int iy0 = static_cast<int>(y0);
  const int iy1 = std::min(static_cast<int>(std::ceil(y1)), h);
  const int ix0 = static_cast<int>(x0);
  const int ix1 = std::min(static_cast<int>(std::ceil(x1)), w);
  float acc[3] = {0.0f, 0.0f, 0.0f};
  float total = 0.0f;
  for (int y = iy0; y < iy1; ++y) {
    const float wy = std::min(y1, static_cast<float>(y + 1)) -
                     std::max(y0, static_cast<float>(y));
    const uint8_t* row = src + static_cast<int64_t>(y) * w * 3;
    for (int x = ix0; x < ix1; ++x) {
      const float wx = std::min(x1, static_cast<float>(x + 1)) -
                       std::max(x0, static_cast<float>(x));
      const float wgt = wy * wx;
      acc[0] += row[x * 3 + 0] * wgt;
      acc[1] += row[x * 3 + 1] * wgt;
      acc[2] += row[x * 3 + 2] * wgt;
      total += wgt;
    }
  }
  const float inv = total > 0.0f ? 1.0f / total : 0.0f;
  out[0] = acc[0] * inv;
  out[1] = acc[1] * inv;
  out[2] = acc[2] * inv;
}

// One frame: cover-scale to (th, tw), center crop, normalise to [-1, 1].
// Area filter when shrinking, bilinear when enlarging.
void preprocess_frame(const uint8_t* src, int sh, int sw, float* dst, int th,
                      int tw) {
  const float scale =
      std::max(static_cast<float>(th) / sh, static_cast<float>(tw) / sw);
  const float inv = 1.0f / scale;
  const float src_h_used = th * inv;
  const float src_w_used = tw * inv;
  const float y_off = (sh - src_h_used) * 0.5f;
  const float x_off = (sw - src_w_used) * 0.5f;
  constexpr float kNorm = 2.0f / 255.0f;
  const bool shrink = scale < 1.0f;
  for (int ty = 0; ty < th; ++ty) {
    float* row = dst + static_cast<int64_t>(ty) * tw * 3;
    if (shrink) {
      const float sy0 = y_off + ty * inv;
      const float sy1 = y_off + (ty + 1) * inv;
      for (int tx = 0; tx < tw; ++tx) {
        const float sx0 = x_off + tx * inv;
        const float sx1 = x_off + (tx + 1) * inv;
        float px[3];
        box_average(src, sh, sw, sy0, sy1, sx0, sx1, px);
        row[tx * 3 + 0] = px[0] * kNorm - 1.0f;
        row[tx * 3 + 1] = px[1] * kNorm - 1.0f;
        row[tx * 3 + 2] = px[2] * kNorm - 1.0f;
      }
    } else {
      const float sy = y_off + (ty + 0.5f) * inv - 0.5f;
      for (int tx = 0; tx < tw; ++tx) {
        const float sx = x_off + (tx + 0.5f) * inv - 0.5f;
        for (int c = 0; c < 3; ++c) {
          row[tx * 3 + c] = sample(src, sh, sw, sy, sx, c) * kNorm - 1.0f;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Batched, threaded preprocessing.
//   srcs:   n pointers to HxWx3 uint8 RGB frames (per-frame dims in shs/sws)
//   dst:    n * th * tw * 3 floats, frame-major
// Returns 0 on success.
int vgt_preprocess_batch(const uint8_t** srcs, const int* shs, const int* sws,
                         int n, float* dst, int th, int tw, int num_threads) {
  if (n <= 0 || th <= 0 || tw <= 0) return 1;
  const int64_t frame_elems = static_cast<int64_t>(th) * tw * 3;
  int workers = num_threads > 0
                    ? num_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  workers = std::max(1, std::min(workers, n));
  std::atomic<int> next(0);
  auto work = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      preprocess_frame(srcs[i], shs[i], sws[i], dst + i * frame_elems, th,
                       tw);
    }
  };
  if (workers == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return 0;
}

// Single frame convenience wrapper.
int vgt_preprocess(const uint8_t* src, int sh, int sw, float* dst, int th,
                   int tw) {
  const uint8_t* srcs[1] = {src};
  return vgt_preprocess_batch(srcs, &sh, &sw, 1, dst, th, tw, 1);
}

}  // extern "C"
