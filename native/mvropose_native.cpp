// Native host-runtime kernels for mvropose_tpu.
//
// The TPU owns the compute path (XLA/Pallas); this library owns the hot
// HOST-side work around it, where the reference delegated to native
// libraries (pandas/numpy/OpenCV internals):
//   * nearest-timestamp sync matching (the merge_asof core) - O(N log M)
//     binary search, called from mvropose_tpu.data.sync for large logs
//   * gaussian heatmap rendering - host fallback / CPU dataloader path
//   * a seqlock "latest frame" mailbox - single-producer single-consumer
//     torn-read-free frame handoff for the realtime rig (the reference
//     shared frames across threads with no synchronization at all,
//     DIP_REAL.py:72,127,219)
//
// C ABI only: consumed via ctypes (no pybind11 in this environment).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// Nearest-timestamp matching.
// query (N, sorted or not), ref (M, MUST be ascending). Writes idx[i] =
// argmin_j |query[i]-ref[j]| and valid[i] = |diff| < tolerance.
// ---------------------------------------------------------------------------
void match_nearest_f64(const double* query, int64_t n_query,
                       const double* ref, int64_t n_ref,
                       double tolerance,
                       int64_t* idx_out, uint8_t* valid_out) {
  if (n_ref == 0) {
    for (int64_t i = 0; i < n_query; ++i) { idx_out[i] = 0; valid_out[i] = 0; }
    return;
  }
  for (int64_t i = 0; i < n_query; ++i) {
    const double q = query[i];
    // lower_bound
    int64_t lo = 0, hi = n_ref;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if (ref[mid] < q) lo = mid + 1; else hi = mid;
    }
    int64_t right = lo < n_ref ? lo : n_ref - 1;
    int64_t left = lo > 0 ? lo - 1 : 0;
    double dl = std::fabs(q - ref[left]);
    double dr = std::fabs(q - ref[right]);
    int64_t best = dr < dl ? right : left;
    idx_out[i] = best;
    valid_out[i] = std::fabs(q - ref[best]) < tolerance ? 1 : 0;
  }
}

// ---------------------------------------------------------------------------
// Gaussian heatmap rendering (reference formula incl. eps floor clip).
// keypoints: (M, 2) as [x, y]; out: (M, H, W) float32.
// ---------------------------------------------------------------------------
void render_heatmaps_f32(const float* keypoints, int64_t n_maps,
                         int64_t height, int64_t width, float sigma,
                         float* out) {
  const double eps = std::numeric_limits<double>::epsilon();
  const float inv2s2 = 1.0f / (2.0f * sigma * sigma);
  for (int64_t m = 0; m < n_maps; ++m) {
    const float kx = keypoints[2 * m];
    const float ky = keypoints[2 * m + 1];
    float* plane = out + m * height * width;
    float peak = 0.0f;
    for (int64_t y = 0; y < height; ++y) {
      const float dy2 = (static_cast<float>(y) - ky) * (static_cast<float>(y) - ky);
      for (int64_t x = 0; x < width; ++x) {
        const float dx = static_cast<float>(x) - kx;
        const float v = std::exp(-(dx * dx + dy2) * inv2s2);
        plane[y * width + x] = v;
        if (v > peak) peak = v;
      }
    }
    const float floor_v = static_cast<float>(eps) * peak;
    for (int64_t i = 0; i < height * width; ++i) {
      if (plane[i] < floor_v) plane[i] = 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Seqlock latest-frame mailbox.
// Writer: begin_write -> memcpy payload -> end_write. Reader: read() retries
// until it observes a consistent (even, unchanged) sequence. No locks, no
// torn frames, wait-free writer.
// ---------------------------------------------------------------------------
struct FrameRing {
  std::atomic<uint64_t> seq;
  int64_t capacity;
  int64_t size;       // bytes of the current frame
  double timestamp;
  uint8_t* data;
};

void* frame_ring_create(int64_t capacity_bytes) {
  auto* r = new FrameRing();
  r->seq.store(0, std::memory_order_relaxed);
  r->capacity = capacity_bytes;
  r->size = 0;
  r->timestamp = 0.0;
  r->data = new uint8_t[capacity_bytes];
  return r;
}

void frame_ring_destroy(void* ring) {
  auto* r = static_cast<FrameRing*>(ring);
  delete[] r->data;
  delete r;
}

int frame_ring_write(void* ring, const uint8_t* src, int64_t size, double timestamp) {
  auto* r = static_cast<FrameRing*>(ring);
  if (size > r->capacity) return -1;
  uint64_t s = r->seq.load(std::memory_order_relaxed);
  r->seq.store(s + 1, std::memory_order_relaxed);  // odd: write in progress
  // #StoreStore: the odd seq must become visible BEFORE any data byte (an
  // acquire fence here orders loads, not stores - on weakly-ordered CPUs
  // the data writes could pass the odd store and a reader could validate a
  // torn frame; x86 TSO masked this). A release fence lowers to a
  // store-store barrier (dmb ishst on aarch64) between the seq store and
  // the subsequent plain data stores.
  std::atomic_thread_fence(std::memory_order_release);
  std::memcpy(r->data, src, size);
  r->size = size;
  r->timestamp = timestamp;
  std::atomic_thread_fence(std::memory_order_release);
  r->seq.store(s + 2, std::memory_order_release);  // even: consistent
  return 0;
}

// Returns bytes read (>0), 0 if no frame yet, -1 if dst too small, -2 if
// contended past max_retries (caller may retry).
int64_t frame_ring_read(void* ring, uint8_t* dst, int64_t dst_capacity,
                        double* timestamp_out, int64_t max_retries) {
  auto* r = static_cast<FrameRing*>(ring);
  for (int64_t attempt = 0; attempt < max_retries; ++attempt) {
    uint64_t s0 = r->seq.load(std::memory_order_acquire);
    if (s0 == 0) return 0;       // nothing written yet
    if (s0 & 1) continue;        // write in progress
    int64_t size = r->size;
    double ts = r->timestamp;
    if (size > dst_capacity) {
      // r->size was read mid-race; only report "too small" if the frame is
      // STABLE (seq unchanged) - otherwise retry, the size belonged to a
      // write in flight.
      std::atomic_thread_fence(std::memory_order_acquire);
      if (r->seq.load(std::memory_order_acquire) == s0) return -1;
      continue;
    }
    if (size < 0 || size > r->capacity) continue;  // torn size, retry
    std::memcpy(dst, r->data, size);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t s1 = r->seq.load(std::memory_order_acquire);
    if (s0 == s1) {
      *timestamp_out = ts;
      return size;
    }
  }
  return -2;
}

uint64_t frame_ring_seq(void* ring) {
  return static_cast<FrameRing*>(ring)->seq.load(std::memory_order_acquire);
}

}  // extern "C"
