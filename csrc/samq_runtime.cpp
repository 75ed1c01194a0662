// samq_runtime — native host-side runtime ops for sam_quantization_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host-side
// hot loops that sit around it (the parts the reference delegates to
// torchvision/cv2 C++ kernels or leaves as slow Python):
//   * COCO uncompressed RLE encode/decode (utils/amg.py:116-158 counterpart)
//   * greedy box NMS (torchvision batched_nms counterpart)
//   * exact Euclidean distance transform (cv2.distanceTransform counterpart,
//     Felzenszwalb-Huttenlocher two-pass, used by the RITM clicker)
//   * block-planar low-bit weight packing (gptq4sam.py:434-497 counterpart)
//
// Plain C ABI for ctypes; no Python.h dependency.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>
#include <limits>

extern "C" {

// --------------------------------------------------------------------------
// RLE encode: column-major (Fortran) runs starting with count of zeros.
// mask: HxW uint8 (row-major). out_counts: caller-allocated buffer of
// capacity cap; returns number of counts written, or -1 if cap too small.
// --------------------------------------------------------------------------
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                   int64_t* out_counts, int64_t cap) {
  int64_t n = 0;
  uint8_t cur = 0;  // runs start with zeros
  int64_t run = 0;
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      uint8_t v = mask[y * w + x] != 0;
      if (v == cur) {
        ++run;
      } else {
        if (n >= cap) return -1;
        out_counts[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (n >= cap) return -1;
  out_counts[n++] = run;
  return n;
}

// RLE decode into HxW uint8 row-major.
void rle_decode(const int64_t* counts, int64_t n_counts, int64_t h, int64_t w,
                uint8_t* out_mask) {
  int64_t idx = 0;
  uint8_t parity = 0;
  std::vector<uint8_t> flat((size_t)h * w);
  for (int64_t i = 0; i < n_counts; ++i) {
    int64_t c = counts[i];
    if (idx + c > h * w) c = h * w - idx;
    std::memset(flat.data() + idx, parity, (size_t)c);
    idx += c;
    parity = !parity;
  }
  // flat is column-major; transpose to row-major
  for (int64_t x = 0; x < w; ++x)
    for (int64_t y = 0; y < h; ++y)
      out_mask[y * w + x] = flat[x * h + y];
}

int64_t rle_area(const int64_t* counts, int64_t n_counts) {
  int64_t area = 0;
  for (int64_t i = 1; i < n_counts; i += 2) area += counts[i];
  return area;
}

// --------------------------------------------------------------------------
// Greedy IoU NMS. boxes: N x 4 (x1, y1, x2, y2) float32, scores: N float32.
// order is computed internally (descending score, stable). keep_out: caller
// buffer of capacity N; returns number kept.
// --------------------------------------------------------------------------
int64_t box_nms(const float* boxes, const float* scores, int64_t n,
                float iou_threshold, int64_t* keep_out) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> suppressed(n, 0);
  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    float wdt = std::max(0.f, boxes[i * 4 + 2] - boxes[i * 4 + 0]);
    float hgt = std::max(0.f, boxes[i * 4 + 3] - boxes[i * 4 + 1]);
    areas[i] = wdt * hgt;
  }
  int64_t n_keep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float* bi = boxes + i * 4;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + j * 4;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, xx2 - xx1) * std::max(0.f, yy2 - yy1);
      float iou = inter / std::max(areas[i] + areas[j] - inter, 1e-9f);
      if (iou > iou_threshold) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// --------------------------------------------------------------------------
// Exact EDT (Felzenszwalb & Huttenlocher), squared distances then sqrt.
// mask: HxW uint8; nonzero cells get distance to the nearest zero cell.
// out: HxW float32.
// --------------------------------------------------------------------------
static void edt_1d(const float* f, float* d, int n, std::vector<int>& v,
                   std::vector<float>& z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<float>::infinity();
  z[1] = std::numeric_limits<float>::infinity();
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      s = ((f[q] + q * (float)q) - (f[v[k]] + v[k] * (float)v[k])) /
          (2.f * q - 2.f * v[k]);
      if (s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = std::numeric_limits<float>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    float dq = q - (float)v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

void distance_transform_edt(const uint8_t* mask, int64_t h, int64_t w,
                            float* out) {
  const float INF = 1e20f;
  std::vector<float> g((size_t)h * w);
  for (int64_t i = 0; i < h * w; ++i) g[i] = mask[i] ? INF : 0.f;
  std::vector<int> v((size_t)std::max(h, w) + 1);
  std::vector<float> z((size_t)std::max(h, w) + 2);
  std::vector<float> f((size_t)std::max(h, w));
  std::vector<float> d((size_t)std::max(h, w));
  // columns
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) f[y] = g[y * w + x];
    edt_1d(f.data(), d.data(), (int)h, v, z);
    for (int64_t y = 0; y < h; ++y) g[y * w + x] = d[y];
  }
  // rows
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) f[x] = g[y * w + x];
    edt_1d(f.data(), d.data(), (int)w, v, z);
    for (int64_t x = 0; x < w; ++x) out[y * w + x] = std::sqrt(d[x]);
  }
}

// --------------------------------------------------------------------------
// Block-planar packing: int32 grid values (K x N, row-major, values in
// [0, 2^bits)) -> packed int32 (K/per x N). See nn/packed.py for layout.
// --------------------------------------------------------------------------
void pack_block_planar(const int32_t* w, int64_t K, int64_t N, int bits,
                       int pack_block, int32_t* out) {
  int per = 32 / bits;
  int rows_per_plane = pack_block / per;
  int64_t out_rows = K / per;
  std::memset(out, 0, sizeof(int32_t) * (size_t)out_rows * N);
  for (int64_t k = 0; k < K; ++k) {
    int64_t blk = k / pack_block;
    int64_t in_blk = k % pack_block;
    int plane = (int)(in_blk / rows_per_plane);
    int64_t r8 = blk * rows_per_plane + (in_blk % rows_per_plane);
    uint32_t shift = (uint32_t)(plane * bits);
    const int32_t* src = w + k * N;
    int32_t* dst = out + r8 * N;
    for (int64_t nn = 0; nn < N; ++nn) {
      dst[nn] = (int32_t)((uint32_t)dst[nn] |
                          (((uint32_t)src[nn]) << shift));
    }
  }
}

}  // extern "C"
