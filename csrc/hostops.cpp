// Native host-side hot loops for the streaming feeder.
//
// The framework's device boundary is split re/im f32 planes
// (aether_primitives_tpu/boundary.py) while the capture interchange format
// is interleaved (re, im) pairs — the reference crate's repr(C) cf32 layout
// (reference src/lib.rs:10, src/util/file.rs). Staging a long capture into
// the device feed therefore runs one deinterleave per block on the host;
// at multi-Gsample/s stream rates that loop is worth native code with
// explicit restrict/vectorization hints (numpy's .real/.imag copies are
// strided memcpys that vectorize poorly on some builds).
//
// Built by aether_primitives_tpu/native.py with g++ -O3; exposed via ctypes.
// Everything here is plain C ABI, single-threaded per call (callers shard
// blocks across threads if needed).

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// interleaved [n] complex64 (2n f32) -> two [n] f32 planes
void deinterleave_c64(const float* __restrict src, float* __restrict re,
                      float* __restrict im, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    re[i] = src[2 * i];
    im[i] = src[2 * i + 1];
  }
}

// two [n] f32 planes -> interleaved [n] complex64
void interleave_c64(const float* __restrict re, const float* __restrict im,
                    float* __restrict dst, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    dst[2 * i] = re[i];
    dst[2 * i + 1] = im[i];
  }
}

// max |x|^2 over an interleaved complex64 buffer + its index — the host-side
// correlation-peak pick for small tails (device handles big blocks)
void peak_c64(const float* __restrict src, size_t n, size_t* idx_out,
              float* mag2_out) {
  float best = -1.0f;
  size_t best_i = 0;
  for (size_t i = 0; i < n; ++i) {
    const float re = src[2 * i], im = src[2 * i + 1];
    const float m = re * re + im * im;
    if (m > best) {
      best = m;
      best_i = i;
    }
  }
  *idx_out = best_i;
  *mag2_out = best;
}

// bit-pack {0,1} bytes LSB-first into bytes (8x smaller capture files for
// demod output streams)
void pack_bits_lsb(const uint8_t* __restrict bits, uint8_t* __restrict out,
                   size_t n_bits) {
  const size_t n_bytes = (n_bits + 7) / 8;
  memset(out, 0, n_bytes);
  for (size_t i = 0; i < n_bits; ++i) {
    out[i / 8] |= (uint8_t)((bits[i] & 1u) << (i % 8));
  }
}

void unpack_bits_lsb(const uint8_t* __restrict packed,
                     uint8_t* __restrict bits, size_t n_bits) {
  for (size_t i = 0; i < n_bits; ++i) {
    bits[i] = (packed[i / 8] >> (i % 8)) & 1u;
  }
}

}  // extern "C"
