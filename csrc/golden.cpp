// Golden scalar quantization reference — host-native C++.
//
// TPU-native rebuild's equivalent of the reference's native layer
// (kkbwilldo/quantizations csrc/kernels.cu): the *device* kernels become
// Pallas/Mosaic kernels, and this file keeps the scalar, sequential,
// bit-exact semantics of the CUDA device functions as a host-side golden
// oracle for differential tests, plus fast host-side packing helpers used
// by the checkpoint loader.
//
// Semantics mirrored (by behavior, independently implemented):
//  - dQuantizeFP4 threshold ladder  (reference kernels.cu:113-163)
//  - dDequantizeFP4Tree             (reference kernels.cu:70-111)
//  - NF4 nearest-entry quantization (table: reference kernels.cu:851)
//  - dQuantize 256-entry binary search with midpoint rounding
//                                   (reference kernels.cu:166-256)
//  - blockwise absmax normalization + nibble packing, high nibble = even
//    element                        (reference kernels.cu:340-478)
//
// Build: g++ -O2 -shared -fPIC -o libgolden.so golden.cpp
// Binding: ctypes (see quantizations_tpu/utils/golden.py). No pybind11 by
// design — the ABI is plain C on contiguous buffers.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- FP4 ----

static unsigned char quantize_fp4_scalar(float x) {
  // Literal fp32 constants of the reference ladder (kernels.cu:126-134).
  int sign = x < 0.0f ? 0b1000 : 0b0000;
  x = std::fabs(x);
  if (x > 0.29166667f) {
    if (x > 0.583333f) {
      return (x > 0.8333333f ? 0b0011 : 0b0010) + sign;
    }
    return (x > 0.4166667f ? 0b0101 : 0b0100) + sign;
  }
  if (x > 0.0859375f) {
    return (x > 0.20833333f ? 0b0111 : 0b0110) + sign;
  }
  return (x > 0.00260417f ? 0b0001 : 0b0000) + sign;
}

// FP4 code -> normalized value (== FP4 codebook, reference core.py:218/12).
static const float kFp4Values[16] = {
    0.00000000f,  5.208333333e-03f, 0.66666667f,  1.00000000f,
    0.33333333f,  0.50000000f,      0.16666667f,  0.25000000f,
    -0.00000000f, -5.208333333e-03f, -0.66666667f, -1.00000000f,
    -0.33333333f, -0.50000000f,     -0.16666667f, -0.25000000f};

// ---------------------------------------------------------------- NF4 ----

static const float kNf4Values[16] = {
    -1.0f,
    -0.6961928009986877f,
    -0.5250730514526367f,
    -0.39491748809814453f,
    -0.28444138169288635f,
    -0.18477343022823334f,
    -0.09105003625154495f,
    0.0f,
    0.07958029955625534f,
    0.16093020141124725f,
    0.24611230194568634f,
    0.33791524171829224f,
    0.44070982933044434f,
    0.5626170039176941f,
    0.7229568362236023f,
    1.0f};

static unsigned char quantize_nf4_scalar(float x) {
  // Nearest entry of the sorted NF4 table with fp32 midpoints; strict '>'
  // so ties round to the lower code (matches bnb's dQuantizeNF4 ladder).
  unsigned char code = 0;
  for (int i = 0; i < 15; ++i) {
    float mid = (kNf4Values[i] + kNf4Values[i + 1]) * 0.5f;
    if (x > mid) code = (unsigned char)(i + 1);
  }
  return code;
}

// ------------------------------------------------------------- 8-bit -----

static unsigned char quantize_code256_scalar(const float* code, float x) {
  // Binary search + midpoint rounding, behaviorally identical to the
  // reference's dQuantize (kernels.cu:166-256), non-stochastic path.
  int pivot = 127, upper_pivot = 255, lower_pivot = 0;
  float lower = -1.0f, upper = 1.0f;
  float val = code[pivot];
  for (int i = 64; i > 0; i >>= 1) {
    if (x > val) {
      lower_pivot = pivot;
      lower = val;
      pivot += i;
    } else {
      upper_pivot = pivot;
      upper = val;
      pivot -= i;
    }
    val = code[pivot];
  }
  if (upper_pivot == 255) upper = code[upper_pivot];
  if (lower_pivot == 0) lower = code[lower_pivot];
  if (x > val) {
    float midpoint = (upper + val) * 0.5f;
    return x > midpoint ? (unsigned char)upper_pivot : (unsigned char)pivot;
  }
  float midpoint = (lower + val) * 0.5f;
  return x < midpoint ? (unsigned char)lower_pivot : (unsigned char)pivot;
}

// ------------------------------------------------------ blockwise API ----

// 4-bit blockwise quantize. A: n fp32 values. out: ceil(n/2) bytes,
// high nibble = even element. absmax: ceil(n/blocksize) fp32.
// quant_type: 0 = fp4, 1 = nf4.
void golden_quantize_4bit(const float* A, unsigned char* out, float* absmax,
                          long long n, int blocksize, int quant_type) {
  long long nblocks = (n + blocksize - 1) / blocksize;
  for (long long b = 0; b < nblocks; ++b) {
    long long start = b * blocksize;
    long long end = start + blocksize < n ? start + blocksize : n;
    float amax = 0.0f;
    for (long long i = start; i < end; ++i) {
      float a = std::fabs(A[i]);
      if (a > amax) amax = a;
    }
    absmax[b] = amax;
    float inv = amax > 0.0f ? 1.0f / amax : 0.0f;
    for (long long i = start; i < end; ++i) {
      float xn = A[i] * inv;
      unsigned char c = quant_type == 0 ? quantize_fp4_scalar(xn)
                                        : quantize_nf4_scalar(xn);
      long long byte = i >> 1;
      if ((i & 1) == 0) {
        out[byte] = (unsigned char)(c << 4);
      } else {
        out[byte] |= c;
      }
    }
  }
}

// 4-bit blockwise dequantize. packed: ceil(n/2) bytes -> out: n fp32.
void golden_dequantize_4bit(const unsigned char* packed, const float* absmax,
                            float* out, long long n, int blocksize,
                            int quant_type) {
  const float* table = quant_type == 0 ? kFp4Values : kNf4Values;
  for (long long i = 0; i < n; ++i) {
    unsigned char byte = packed[i >> 1];
    unsigned char c = (i & 1) == 0 ? (byte >> 4) : (byte & 0xF);
    out[i] = table[c] * absmax[i / blocksize];
  }
}

// 8-bit blockwise quantize against a 256-entry sorted codebook.
void golden_quantize_blockwise_8bit(const float* code, const float* A,
                                    unsigned char* out, float* absmax,
                                    long long n, int blocksize) {
  long long nblocks = (n + blocksize - 1) / blocksize;
  for (long long b = 0; b < nblocks; ++b) {
    long long start = b * blocksize;
    long long end = start + blocksize < n ? start + blocksize : n;
    float amax = 0.0f;
    for (long long i = start; i < end; ++i) {
      float a = std::fabs(A[i]);
      if (a > amax) amax = a;
    }
    absmax[b] = amax;
    float inv = amax > 0.0f ? 1.0f / amax : 0.0f;
    for (long long i = start; i < end; ++i) {
      out[i] = quantize_code256_scalar(code, A[i] * inv);
    }
  }
}

void golden_dequantize_blockwise_8bit(const float* code,
                                      const unsigned char* q,
                                      const float* absmax, float* out,
                                      long long n, int blocksize) {
  for (long long i = 0; i < n; ++i) {
    out[i] = code[q[i]] * absmax[i / blocksize];
  }
}

// Fused golden GEMV: out[m] = sum_k dequant(W[m,k]) * x[k], fp32
// sequential accumulation (accumulation-order reference for kernel tests;
// the reference kernel also accumulates fp32, kernels.cu:1201-1211).
void golden_gemv_4bit(const unsigned char* packed, const float* absmax,
                      const float* x, float* out, long long M, long long K,
                      int blocksize, int quant_type) {
  const float* table = quant_type == 0 ? kFp4Values : kNf4Values;
  for (long long m = 0; m < M; ++m) {
    double acc = 0.0;  // high-precision host accumulation for the oracle
    for (long long k = 0; k < K; ++k) {
      long long i = m * K + k;
      unsigned char byte = packed[i >> 1];
      unsigned char c = (i & 1) == 0 ? (byte >> 4) : (byte & 0xF);
      acc += (double)(table[c] * absmax[i / blocksize]) * (double)x[k];
    }
    out[m] = (float)acc;
  }
}

// Host-side repack: bnb byte layout -> int32 words (little-endian byte
// order) for the TPU kernels. This is a pure memcpy on little-endian
// hosts; kept explicit for clarity and for big-endian safety.
void golden_repack_bytes_to_i32(const unsigned char* packed, int32_t* out,
                                long long nbytes) {
  for (long long w = 0; w < nbytes / 4; ++w) {
    out[w] = (int32_t)((uint32_t)packed[4 * w] |
                       ((uint32_t)packed[4 * w + 1] << 8) |
                       ((uint32_t)packed[4 * w + 2] << 16) |
                       ((uint32_t)packed[4 * w + 3] << 24));
  }
}

// Golden pair-layout pack: bnb packed bytes of a [rows, cols] weight ->
// the SWAR row-pair block-major int32 layout [rows/2, cols/4] used by
// the fused FP4 decode kernel (ops/qmatmul.py documents the layout).
// Scalar reference for differential tests of planar_to_pair.
//
// Word (i, w) for w = half*8*NB + r*NB + b (NB = cols/64, r in [0,8),
// half in {0,1}) holds, at nibble p (low 16 bits: row 2i; high: 2i+1),
// the code of column c = 64*b + 8*r + 4*half + p.
void golden_pack_pair(const unsigned char* packed, int32_t* out,
                      long long rows, long long cols) {
  long long nb = cols / 64;
  auto code_at = [&](long long r, long long c) -> uint32_t {
    unsigned char byte = packed[(r * cols + c) / 2];
    return (c % 2 == 0) ? (byte >> 4) : (byte & 0xF);
  };
  for (long long i = 0; i < rows / 2; ++i) {
    for (long long w = 0; w < cols / 4; ++w) {
      long long half = w / (8 * nb);
      long long r = (w % (8 * nb)) / nb;
      long long b = w % nb;
      uint32_t word = 0;
      for (int p = 0; p < 4; ++p) {
        long long c = 64 * b + 8 * r + 4 * half + p;
        word |= code_at(2 * i, c) << (4 * p);
        word |= code_at(2 * i + 1, c) << (16 + 4 * p);
      }
      out[i * (cols / 4) + w] = (int32_t)word;
    }
  }
}

}  // extern "C"
