// Host-RAM feature gather kernel (OpenMP).
//
// Native analog of the reference's CPU extraction path
// (samgraph/common/cpu/cpu_extraction.cc: OMP-parallel row gather feeding the
// cache-miss pipeline).  On TPU hosts this serves the cold tier of the
// tiered feature store: gather miss rows from the mmap'd/host-resident
// feature matrix into a pinned staging buffer for async H2D.
//
// Build: make -C cpp  (produces libxgnnhost.so, loaded via ctypes by
// xgnn_tpu/clib.py with a numpy fallback).

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Gather rows: out[i, :] = src[ids[i], :] for i in [0, n).
// Negative ids write zeros (defensive: EMPTY padding).
void xgnn_gather_rows_f32(const float *src, int64_t dim, const int64_t *ids,
                          int64_t n, float *out) {
  const size_t row_bytes = static_cast<size_t>(dim) * sizeof(float);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t id = ids[i];
    float *dst = out + i * dim;
    if (id < 0) {
      std::memset(dst, 0, row_bytes);
    } else {
      std::memcpy(dst, src + id * dim, row_bytes);
    }
  }
}

// Same for 2-byte elements (bf16/f16 stored as uint16).
void xgnn_gather_rows_u16(const uint16_t *src, int64_t dim,
                          const int64_t *ids, int64_t n, uint16_t *out) {
  const size_t row_bytes = static_cast<size_t>(dim) * sizeof(uint16_t);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t id = ids[i];
    uint16_t *dst = out + i * dim;
    if (id < 0) {
      std::memset(dst, 0, row_bytes);
    } else {
      std::memcpy(dst, src + id * dim, row_bytes);
    }
  }
}

// Per-node access-frequency accumulation (presample support for huge node
// counts where device scatter-add memory is precious).
void xgnn_accumulate_freq(const int32_t *ids, int64_t n, int32_t *freq,
                          int64_t num_node) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t id = ids[i];
    if (id >= 0 && id < num_node) {
#pragma omp atomic
      freq[id]++;
    }
  }
}

int xgnn_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
