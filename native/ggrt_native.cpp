// Native host-side runtime kernels for the GGRt-TPU data pipeline.
//
// The reference's only native component is its CUDA rasterizer (SURVEY.md
// §2.1) — on TPU that became Pallas. This library covers the *host* side
// instead: the input-pipeline hot loops that Python/numpy do slowly —
// anti-aliased bilinear resize (loader_resize's blur+resize,
// data_utils.py:130-155) and batched nearest-pose scoring
// (data_utils.py:290-328) — exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC ggrt_native.cpp
//        -o libggrt_native.so          (see native/build.py)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Anti-aliased bilinear resize, float32 HWC.
// Box-prefilters when downsampling (integral-image average over the
// source footprint), then bilinear-samples: equivalent quality to the
// GaussianBlur+INTER_LINEAR combination the reference uses.
void resize_bilinear_aa(const float* src, int sh, int sw, int c,
                        float* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  const bool down = (sy > 1.0f) || (sx > 1.0f);

  std::vector<double> integral;
  if (down) {
    // Channel-interleaved integral image, (sh+1) x (sw+1) x c.
    integral.assign(static_cast<size_t>(sh + 1) * (sw + 1) * c, 0.0);
    for (int y = 0; y < sh; ++y) {
      for (int x = 0; x < sw; ++x) {
        for (int k = 0; k < c; ++k) {
          size_t i00 = (static_cast<size_t>(y) * (sw + 1) + x) * c + k;
          size_t i01 = (static_cast<size_t>(y) * (sw + 1) + x + 1) * c + k;
          size_t i10 = (static_cast<size_t>(y + 1) * (sw + 1) + x) * c + k;
          size_t i11 = (static_cast<size_t>(y + 1) * (sw + 1) + x + 1) * c + k;
          integral[i11] = integral[i01] + integral[i10] - integral[i00] +
                          src[(static_cast<size_t>(y) * sw + x) * c + k];
        }
      }
    }
  }

#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      if (down) {
        // Average the exact source footprint of this output pixel.
        float y0f = y * sy, y1f = (y + 1) * sy;
        float x0f = x * sx, x1f = (x + 1) * sx;
        int y0 = std::max(0, static_cast<int>(std::floor(y0f)));
        int y1 = std::min(sh, std::max(y0 + 1, static_cast<int>(std::ceil(y1f))));
        int x0 = std::max(0, static_cast<int>(std::floor(x0f)));
        int x1 = std::min(sw, std::max(x0 + 1, static_cast<int>(std::ceil(x1f))));
        double area = static_cast<double>(y1 - y0) * (x1 - x0);
        for (int k = 0; k < c; ++k) {
          size_t a = (static_cast<size_t>(y0) * (sw + 1) + x0) * c + k;
          size_t b = (static_cast<size_t>(y0) * (sw + 1) + x1) * c + k;
          size_t d = (static_cast<size_t>(y1) * (sw + 1) + x0) * c + k;
          size_t e = (static_cast<size_t>(y1) * (sw + 1) + x1) * c + k;
          double sum = integral[e] - integral[b] - integral[d] + integral[a];
          dst[(static_cast<size_t>(y) * dw + x) * c + k] =
              static_cast<float>(sum / area);
        }
      } else {
        // Upsample: plain bilinear with half-pixel centers.
        float fy = (y + 0.5f) * sy - 0.5f;
        float fx = (x + 0.5f) * sx - 0.5f;
        int y0 = static_cast<int>(std::floor(fy));
        int x0 = static_cast<int>(std::floor(fx));
        float wy = fy - y0, wx = fx - x0;
        int y0c = std::clamp(y0, 0, sh - 1), y1c = std::clamp(y0 + 1, 0, sh - 1);
        int x0c = std::clamp(x0, 0, sw - 1), x1c = std::clamp(x0 + 1, 0, sw - 1);
        for (int k = 0; k < c; ++k) {
          auto at = [&](int yy, int xx) {
            return src[(static_cast<size_t>(yy) * sw + xx) * c + k];
          };
          float v = (1 - wy) * ((1 - wx) * at(y0c, x0c) + wx * at(y0c, x1c)) +
                    wy * ((1 - wx) * at(y1c, x0c) + wx * at(y1c, x1c));
          dst[(static_cast<size_t>(y) * dw + x) * c + k] = v;
        }
      }
    }
  }
}

// Batched camera-center distances: dists[i] = ||ref_pos[i] - tar_pos||.
// (The 'dist' selection rule of get_nearest_pose_ids.)
void pose_distances(const float* ref_c2w, int n, const float* tar_c2w,
                    float* dists) {
  const float tx = tar_c2w[3], ty = tar_c2w[7], tz = tar_c2w[11];
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const float* m = ref_c2w + static_cast<size_t>(i) * 16;
    float dx = m[3] - tx, dy = m[7] - ty, dz = m[11] - tz;
    dists[i] = std::sqrt(dx * dx + dy * dy + dz * dz);
  }
}

// ---- SPSC ring of byte blobs for loader prefetch ----------------------

struct Ring {
  std::vector<std::vector<uint8_t>> slots;
  std::atomic<uint64_t> head{0};  // next write
  std::atomic<uint64_t> tail{0};  // next read
};

void* ring_create(int capacity) {
  Ring* r = new Ring();
  r->slots.resize(capacity);
  return r;
}

void ring_destroy(void* h) { delete static_cast<Ring*>(h); }

// Returns 1 on success, 0 if full.
int ring_push(void* h, const uint8_t* data, int64_t size) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->slots.size()) return 0;
  auto& slot = r->slots[head % r->slots.size()];
  slot.assign(data, data + size);
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// Returns blob size (and copies up to max_size bytes into out), -1 if empty.
int64_t ring_pop(void* h, uint8_t* out, int64_t max_size) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  if (tail >= head) return -1;
  auto& slot = r->slots[tail % r->slots.size()];
  int64_t size = static_cast<int64_t>(slot.size());
  std::memcpy(out, slot.data(), std::min<int64_t>(size, max_size));
  r->tail.store(tail + 1, std::memory_order_release);
  return size;
}

int64_t ring_size(void* h) {
  Ring* r = static_cast<Ring*>(h);
  return static_cast<int64_t>(r->head.load() - r->tail.load());
}

}  // extern "C"
