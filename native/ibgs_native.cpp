// Native host-side runtime components, C ABI for ctypes.
//
// 1. knn_mean_sq_dist_3: mean squared distance to the 3 nearest
//    neighbours per point — the Gaussian-scale initialiser.  Morton-order
//    sort + box-culled candidate scan (same algorithmic family as the
//    reference's CUDA simple-knn, re-designed for multicore CPU hosts:
//    per-box AABBs prune candidate boxes, exact within survivors).
// 2. parse_colmap_points3d: zero-copy scan of a COLMAP points3D.bin blob
//    (variable-length records make this slow in pure Python).
//
// Build: make -C native   → libibgs_native.so

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Box {
  float lo[3], hi[3];
};

inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

inline uint32_t morton3(float x, float y, float z) {
  uint32_t xi = (uint32_t)std::min(std::max(x * 1024.0f, 0.0f), 1023.0f);
  uint32_t yi = (uint32_t)std::min(std::max(y * 1024.0f, 0.0f), 1023.0f);
  uint32_t zi = (uint32_t)std::min(std::max(z * 1024.0f, 0.0f), 1023.0f);
  return expand_bits(xi) | (expand_bits(yi) << 1) | (expand_bits(zi) << 2);
}

inline float box_point_sq(const Box& b, const float* p) {
  float d = 0.f;
  for (int k = 0; k < 3; ++k) {
    float diff = std::max(std::max(b.lo[k] - p[k], p[k] - b.hi[k]), 0.f);
    d += diff * diff;
  }
  return d;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned t = std::max(1u, std::thread::hardware_concurrency());
  if (n < 4096) t = 1;
  std::vector<std::thread> threads;
  int64_t chunk = (n + t - 1) / t;
  for (unsigned i = 0; i < t; ++i) {
    int64_t lo = i * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// points: (n, 3) float32 row-major; out: (n,) float32.
void knn_mean_sq_dist_3(const float* points, int64_t n, float* out) {
  if (n <= 3) {
    for (int64_t i = 0; i < n; ++i) out[i] = 1e-4f;
    return;
  }
  float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (int64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], points[3 * i + k]);
      hi[k] = std::max(hi[k], points[3 * i + k]);
    }
  float ext[3];
  for (int k = 0; k < 3; ++k) ext[k] = std::max(hi[k] - lo[k], 1e-9f);

  std::vector<std::pair<uint32_t, int64_t>> order(n);
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      const float* p = points + 3 * i;
      order[i] = {morton3((p[0] - lo[0]) / ext[0], (p[1] - lo[1]) / ext[1],
                          (p[2] - lo[2]) / ext[2]),
                  i};
    }
  });
  std::sort(order.begin(), order.end());

  const int64_t BOX = 1024;
  int64_t nbox = (n + BOX - 1) / BOX;
  std::vector<Box> boxes(nbox);
  for (int64_t b = 0; b < nbox; ++b) {
    Box bx;
    for (int k = 0; k < 3; ++k) {
      bx.lo[k] = FLT_MAX;
      bx.hi[k] = -FLT_MAX;
    }
    for (int64_t i = b * BOX; i < std::min(n, (b + 1) * BOX); ++i) {
      const float* p = points + 3 * order[i].second;
      for (int k = 0; k < 3; ++k) {
        bx.lo[k] = std::min(bx.lo[k], p[k]);
        bx.hi[k] = std::max(bx.hi[k], p[k]);
      }
    }
    boxes[b] = bx;
  }

  parallel_for(n, [&](int64_t a, int64_t b_) {
    for (int64_t i = a; i < b_; ++i) {
      const float* p = points + 3 * order[i].second;
      float best[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
      auto update = [&](float d) {
        if (d < best[2]) {
          best[2] = d;
          if (best[2] < best[1]) std::swap(best[1], best[2]);
          if (best[1] < best[0]) std::swap(best[0], best[1]);
        }
      };
      // seed with the Morton-neighbour window for a tight prune radius
      const int64_t w_lo = std::max<int64_t>(0, i - 16);
      const int64_t w_hi = std::min(n, i + 17);
      for (int64_t j = w_lo; j < w_hi; ++j) {
        if (j == i) continue;
        const float* q = points + 3 * order[j].second;
        float d = 0;
        for (int k = 0; k < 3; ++k) d += (p[k] - q[k]) * (p[k] - q[k]);
        update(d);
      }
      for (int64_t b = 0; b < nbox; ++b) {
        if (box_point_sq(boxes[b], p) > best[2]) continue;
        int64_t j0 = b * BOX, j1 = std::min(n, (b + 1) * BOX);
        for (int64_t j = j0; j < j1; ++j) {
          if (j >= w_lo && j < w_hi) continue;  // already seeded
          const float* q = points + 3 * order[j].second;
          float d = 0;
          for (int k = 0; k < 3; ++k) d += (p[k] - q[k]) * (p[k] - q[k]);
          update(d);
        }
      }
      out[order[i].second] = (best[0] + best[1] + best[2]) / 3.0f;
    }
  });
}

// ABI version for the ctypes loader: bumped when an exported signature
// changes so a stale libibgs_native.so is never called with the new layout.
int64_t ibgs_native_abi(void) { return 2; }

// blob: raw bytes of points3D.bin; fills xyz (n,3) f64, rgb (n,3) u8, and
// (optionally) reprojection error err (n,) f64 + track length tlen (n,) i64
// so callers can apply the reference's quality filter
// (scene/colmap_loader.py:144-157: drop error > 2.0 or track < 3).
// Returns count or -1 on truncated/corrupt input.
int64_t parse_colmap_points3d(const uint8_t* blob, int64_t nbytes,
                              double* xyz, uint8_t* rgb, double* err,
                              int64_t* tlen_out) {
  if (nbytes < 8) return -1;
  uint64_t count;
  std::memcpy(&count, blob, 8);
  int64_t off = 8;
  for (uint64_t i = 0; i < count; ++i) {
    if (off + 8 + 24 + 3 + 8 + 8 > nbytes) return -1;
    off += 8;  // point id
    if (xyz) std::memcpy(xyz + 3 * i, blob + off, 24);
    off += 24;
    if (rgb) std::memcpy(rgb + 3 * i, blob + off, 3);
    off += 3;
    if (err) std::memcpy(err + i, blob + off, 8);
    off += 8;  // error
    uint64_t tlen;
    std::memcpy(&tlen, blob + off, 8);
    if (tlen_out) tlen_out[i] = (int64_t)tlen;
    off += 8;
    off += (int64_t)tlen * 8;
    if (off > nbytes) return -1;
  }
  return (int64_t)count;
}

}  // extern "C"
