// llmc_host — native host-side helpers for llm_compressor_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this C++ library covers the
// host-side runtime work the reference implements natively (its only native
// component is the CUDA Hadamard extension; our kernel equivalent lives in
// Pallas — see kernels/hadamard.py). Here: the checkpoint/weight-IO hot
// path used when packing multi-GB checkpoints offline:
//
//   * group-wise symmetric int4/int8 quantization of f32 weight rows
//     (absmax scale per group, restrictive range, banker's rounding to
//     match the jnp path bit-for-bit)
//   * nibble pack/unpack in the kernel's "group halves" layout
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Round half to even (matches jnp.round / torch.round).
static inline float round_even(float x) { return std::nearbyintf(x); }

// Quantize rows of W (n_rows x n_cols, f32, row-major) with symmetric
// absmax scales per contiguous group of `group` columns.
// Outputs: codes int8 (same shape, values in [-qmax, qmax]),
//          scales f32 (n_rows x n_cols/group).
void quantize_int_rows(const float* W, int64_t n_rows, int64_t n_cols,
                       int64_t group, int qmax, int8_t* codes, float* scales) {
  const int64_t n_groups = n_cols / group;
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* row = W + r * n_cols;
    int8_t* crow = codes + r * n_cols;
    float* srow = scales + r * n_groups;
    for (int64_t g = 0; g < n_groups; ++g) {
      const float* blk = row + g * group;
      float amax = 0.0f;
      for (int64_t i = 0; i < group; ++i) {
        float a = std::fabs(blk[i]);
        if (a > amax) amax = a;
      }
      float s = amax / (float)qmax;
      if (s < 1e-5f) s = 1e-5f;
      srow[g] = s;
      const float inv = 1.0f / s;
      int8_t* cblk = crow + g * group;
      for (int64_t i = 0; i < group; ++i) {
        float q = round_even(blk[i] * inv);
        if (q > qmax) q = (float)qmax;
        if (q < -qmax) q = (float)-qmax;
        cblk[i] = (int8_t)q;
      }
    }
  }
}

// Pack int4 codes (int8 in [-7,7], +8 biased to [1,15]) two per byte in the
// "group halves" layout: byte i of a group holds elements (i, i+group/2).
void pack_int4(const int8_t* codes, int64_t n_rows, int64_t n_cols,
               int64_t group, uint8_t* packed) {
  const int64_t half = group / 2;
  const int64_t n_groups = n_cols / group;
  const int64_t out_cols = n_cols / 2;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int8_t* row = codes + r * n_cols;
    uint8_t* prow = packed + r * out_cols;
    for (int64_t g = 0; g < n_groups; ++g) {
      const int8_t* blk = row + g * group;
      uint8_t* pblk = prow + g * half;
      for (int64_t i = 0; i < half; ++i) {
        uint8_t lo = (uint8_t)(blk[i] + 8);
        uint8_t hi = (uint8_t)(blk[i + half] + 8);
        pblk[i] = (uint8_t)(lo | (hi << 4));
      }
    }
  }
}

// Inverse of pack_int4: unpack to int8 codes in [-7, 7].
void unpack_int4(const uint8_t* packed, int64_t n_rows, int64_t n_cols,
                 int64_t group, int8_t* codes) {
  const int64_t half = group / 2;
  const int64_t n_groups = n_cols / group;
  const int64_t in_cols = n_cols / 2;
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint8_t* prow = packed + r * in_cols;
    int8_t* row = codes + r * n_cols;
    for (int64_t g = 0; g < n_groups; ++g) {
      const uint8_t* pblk = prow + g * half;
      int8_t* blk = row + g * group;
      for (int64_t i = 0; i < half; ++i) {
        blk[i] = (int8_t)((pblk[i] & 0x0F) - 8);
        blk[i + half] = (int8_t)((pblk[i] >> 4) - 8);
      }
    }
  }
}

// Fused: f32 weights -> packed int4 + scales in one pass (no intermediate
// int8 buffer in Python).
void quantize_pack_int4(const float* W, int64_t n_rows, int64_t n_cols,
                        int64_t group, uint8_t* packed, float* scales) {
  const int64_t half = group / 2;
  const int64_t n_groups = n_cols / group;
  const int64_t out_cols = n_cols / 2;
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* row = W + r * n_cols;
    uint8_t* prow = packed + r * out_cols;
    float* srow = scales + r * n_groups;
    for (int64_t g = 0; g < n_groups; ++g) {
      const float* blk = row + g * group;
      float amax = 0.0f;
      for (int64_t i = 0; i < group; ++i) {
        float a = std::fabs(blk[i]);
        if (a > amax) amax = a;
      }
      float s = amax / 7.0f;
      if (s < 1e-5f) s = 1e-5f;
      srow[g] = s;
      const float inv = 1.0f / s;
      uint8_t* pblk = prow + g * half;
      for (int64_t i = 0; i < half; ++i) {
        float qa = round_even(blk[i] * inv);
        float qb = round_even(blk[i + half] * inv);
        if (qa > 7.f) qa = 7.f; if (qa < -7.f) qa = -7.f;
        if (qb > 7.f) qb = 7.f; if (qb < -7.f) qb = -7.f;
        pblk[i] = (uint8_t)(((int)qa + 8) | (((int)qb + 8) << 4));
      }
    }
  }
}

// ---- "pair planes" int4 layout (round 5, the kernel default) ----------
// Byte j of group pair t holds (elem j of group 2t) in the low nibble and
// (elem j of group 2t+1) in the high nibble — the W4A8 kernel's per-group
// MXU dots then read contiguous K=g nibble-plane slices with byte-op-only
// unpack (see kernels/w4a8_matmul.py / qformats/qtensor.py). Requires an
// even group count.

void pack_int4_pairs(const int8_t* codes, int64_t n_rows, int64_t n_cols,
                     int64_t group, uint8_t* packed) {
  const int64_t n_pairs = n_cols / (2 * group);
  const int64_t out_cols = n_cols / 2;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int8_t* row = codes + r * n_cols;
    uint8_t* prow = packed + r * out_cols;
    for (int64_t t = 0; t < n_pairs; ++t) {
      const int8_t* lo = row + (2 * t) * group;
      const int8_t* hi = row + (2 * t + 1) * group;
      uint8_t* pblk = prow + t * group;
      for (int64_t j = 0; j < group; ++j)
        pblk[j] = (uint8_t)((uint8_t)(lo[j] + 8) | ((uint8_t)(hi[j] + 8) << 4));
    }
  }
}

void unpack_int4_pairs(const uint8_t* packed, int64_t n_rows, int64_t n_cols,
                       int64_t group, int8_t* codes) {
  const int64_t n_pairs = n_cols / (2 * group);
  const int64_t in_cols = n_cols / 2;
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint8_t* prow = packed + r * in_cols;
    int8_t* row = codes + r * n_cols;
    for (int64_t t = 0; t < n_pairs; ++t) {
      const uint8_t* pblk = prow + t * group;
      int8_t* lo = row + (2 * t) * group;
      int8_t* hi = row + (2 * t + 1) * group;
      for (int64_t j = 0; j < group; ++j) {
        lo[j] = (int8_t)((pblk[j] & 0x0F) - 8);
        hi[j] = (int8_t)((pblk[j] >> 4) - 8);
      }
    }
  }
}

// Fused: f32 weights -> pair-planes packed int4 + scales in one pass.
void quantize_pack_int4_pairs(const float* W, int64_t n_rows, int64_t n_cols,
                              int64_t group, uint8_t* packed, float* scales) {
  const int64_t n_groups = n_cols / group;
  const int64_t out_cols = n_cols / 2;
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* row = W + r * n_cols;
    uint8_t* prow = packed + r * out_cols;
    float* srow = scales + r * n_groups;
    for (int64_t t = 0; t < n_groups / 2; ++t) {
      float inv[2];
      for (int h = 0; h < 2; ++h) {
        const int64_t g = 2 * t + h;
        const float* blk = row + g * group;
        float amax = 0.0f;
        for (int64_t i = 0; i < group; ++i) {
          float a = std::fabs(blk[i]);
          if (a > amax) amax = a;
        }
        float s = amax / 7.0f;
        if (s < 1e-5f) s = 1e-5f;
        srow[g] = s;
        inv[h] = 1.0f / s;
      }
      const float* lo = row + (2 * t) * group;
      const float* hi = row + (2 * t + 1) * group;
      uint8_t* pblk = prow + t * group;
      for (int64_t j = 0; j < group; ++j) {
        float qa = round_even(lo[j] * inv[0]);
        float qb = round_even(hi[j] * inv[1]);
        if (qa > 7.f) qa = 7.f; if (qa < -7.f) qa = -7.f;
        if (qb > 7.f) qb = 7.f; if (qb < -7.f) qb = -7.f;
        pblk[j] = (uint8_t)(((int)qa + 8) | (((int)qb + 8) << 4));
      }
    }
  }
}

}  // extern "C"
