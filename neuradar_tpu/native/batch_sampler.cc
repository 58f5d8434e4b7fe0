// Native host-side batch assembly for the datamanager.
//
// The reference parallelizes data loading with 8 Python mp.Process workers
// building whole RayBundles (image_lidar_datamanager.py:83-148). Here rays
// are generated on-device, so the host work is pure memory gathering:
// image-patch gathers (uint8 -> normalized float) and lidar point subset
// gathers. This C++ implementation threads those gathers so a single host
// thread can feed a TPU slice at full rate.
//
// Built on demand by neuradar_tpu/native/__init__.py (g++ -O3 -shared) and
// called through ctypes; the datamanager falls back to numpy when the
// toolchain is unavailable.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather B patches of size P x P x 3 from a uint8 image stack [N, H, W, 3]
// as raw uint8 [B, P, P, 3] — normalization happens on-device, and uint8
// ships 4x less host->device traffic than float32.
void sample_patches_u8(const uint8_t* images, int64_t n_images, int64_t H, int64_t W,
                       const int32_t* frame_idx, const int32_t* top_left,  // [B], [B, 2]
                       int64_t B, int64_t P, uint8_t* out) {
  int n_threads = std::min<int64_t>(B, std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      const int64_t f = frame_idx[b];
      const int64_t r0 = top_left[2 * b];
      const int64_t c0 = top_left[2 * b + 1];
      for (int64_t r = 0; r < P; ++r) {
        const uint8_t* src = images + (((f * H) + r0 + r) * W + c0) * 3;
        uint8_t* dst = out + ((b * P + r) * P) * 3;
        std::memcpy(dst, src, P * 3);
      }
    }
  };
  std::vector<std::thread> threads;
  int64_t chunk = (B + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b0 = t * chunk;
    int64_t b1 = std::min<int64_t>(B, b0 + chunk);
    if (b0 >= b1) break;
    threads.emplace_back(worker, b0, b1);
  }
  for (auto& t : threads) t.join();
}

// Gather K rows from packed float32 points [N, D] with int64 scan ids [N]
// into out_points [K, D] and out_scans [K].
void sample_points(const float* points, const int64_t* scan_ids, int64_t n, int64_t D,
                   const int64_t* idx, int64_t K, float* out_points, int32_t* out_scans) {
  int n_threads = std::min<int64_t>(8, std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  auto worker = [&](int64_t k0, int64_t k1) {
    for (int64_t k = k0; k < k1; ++k) {
      const int64_t i = idx[k];
      std::memcpy(out_points + k * D, points + i * D, D * sizeof(float));
      out_scans[k] = static_cast<int32_t>(scan_ids[i]);
    }
  };
  std::vector<std::thread> threads;
  int64_t chunk = (K + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t k0 = t * chunk;
    int64_t k1 = std::min<int64_t>(K, k0 + chunk);
    if (k0 >= k1) break;
    threads.emplace_back(worker, k0, k1);
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
