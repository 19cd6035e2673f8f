// SPDX-License-Identifier: Apache-2.0
// Native bit-packing engine for checkpoint loading.
//
// Packs (N, K) uint8 quantization codes into LSB-first {8,16,32,64}-bit
// words, transposed to the kernel layout (K/elems, N) — the same layout the
// jnp reference (bitpack.py) produces, bit-for-bit. Multithreaded over N
// columns; a 70B-parameter checkpoint packs at memory bandwidth instead of
// tracing through XLA on the host.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

template <typename WordT>
void pack_over_cols_t(const uint8_t* W, int64_t N, int64_t K, int W_nbits,
                      WordT* out /* (K/elems, N) */, int n_threads) {
  const int elems = static_cast<int>(sizeof(WordT) * 8) / W_nbits;
  const int64_t rows = K / elems;

  auto work = [&](int64_t n0, int64_t n1) {
    for (int64_t n = n0; n < n1; ++n) {
      const uint8_t* src = W + n * K;
      for (int64_t r = 0; r < rows; ++r) {
        WordT word = 0;
        const uint8_t* s = src + r * elems;
        for (int j = 0; j < elems; ++j) {
          word |= static_cast<WordT>(s[j]) << (j * W_nbits);
        }
        out[r * N + n] = word;  // transposed store
      }
    }
  };

  if (n_threads <= 1 || N < 64) {
    work(0, N);
    return;
  }
  std::vector<std::thread> ts;
  const int64_t chunk = (N + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t a = t * chunk;
    const int64_t b = std::min<int64_t>(N, a + chunk);
    if (a >= b) break;
    ts.emplace_back(work, a, b);
  }
  for (auto& t : ts) t.join();
}

template <typename WordT>
void unpack_over_cols_t(const WordT* packed /* (K/elems, N) */, int64_t N,
                        int64_t K, int W_nbits, uint8_t* out /* (N, K) */,
                        int n_threads) {
  const int elems = static_cast<int>(sizeof(WordT) * 8) / W_nbits;
  const int64_t rows = K / elems;
  const WordT mask = static_cast<WordT>((WordT(1) << W_nbits) - 1);

  auto work = [&](int64_t n0, int64_t n1) {
    for (int64_t n = n0; n < n1; ++n) {
      uint8_t* dst = out + n * K;
      for (int64_t r = 0; r < rows; ++r) {
        WordT word = packed[r * N + n];
        for (int j = 0; j < elems; ++j) {
          dst[r * elems + j] =
              static_cast<uint8_t>((word >> (j * W_nbits)) & mask);
        }
      }
    }
  };

  if (n_threads <= 1 || N < 64) {
    work(0, N);
    return;
  }
  std::vector<std::thread> ts;
  const int64_t chunk = (N + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t a = t * chunk;
    const int64_t b = std::min<int64_t>(N, a + chunk);
    if (a >= b) break;
    ts.emplace_back(work, a, b);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// bitwidth in {8, 16, 32, 64}; out must hold (K/elems)*N words.
// Returns 0 on success, nonzero on invalid arguments.
int gemlite_pack_over_cols(const uint8_t* W, int64_t N, int64_t K,
                           int W_nbits, int bitwidth, void* out,
                           int n_threads) {
  if (W_nbits <= 0 || bitwidth % W_nbits || K % (bitwidth / W_nbits))
    return 1;
  switch (bitwidth) {
    case 8:
      pack_over_cols_t<uint8_t>(W, N, K, W_nbits,
                                static_cast<uint8_t*>(out), n_threads);
      return 0;
    case 16:
      pack_over_cols_t<uint16_t>(W, N, K, W_nbits,
                                 static_cast<uint16_t*>(out), n_threads);
      return 0;
    case 32:
      pack_over_cols_t<uint32_t>(W, N, K, W_nbits,
                                 static_cast<uint32_t*>(out), n_threads);
      return 0;
    case 64:
      pack_over_cols_t<uint64_t>(W, N, K, W_nbits,
                                 static_cast<uint64_t*>(out), n_threads);
      return 0;
    default:
      return 2;
  }
}

int gemlite_unpack_over_cols(const void* packed, int64_t N, int64_t K,
                             int W_nbits, int bitwidth, uint8_t* out,
                             int n_threads) {
  if (W_nbits <= 0 || bitwidth % W_nbits || K % (bitwidth / W_nbits))
    return 1;
  switch (bitwidth) {
    case 8:
      unpack_over_cols_t<uint8_t>(static_cast<const uint8_t*>(packed), N, K,
                                  W_nbits, out, n_threads);
      return 0;
    case 16:
      unpack_over_cols_t<uint16_t>(static_cast<const uint16_t*>(packed), N, K,
                                   W_nbits, out, n_threads);
      return 0;
    case 32:
      unpack_over_cols_t<uint32_t>(static_cast<const uint32_t*>(packed), N, K,
                                   W_nbits, out, n_threads);
      return 0;
    case 64:
      unpack_over_cols_t<uint64_t>(static_cast<const uint64_t*>(packed), N, K,
                                   W_nbits, out, n_threads);
      return 0;
    default:
      return 2;
  }
}

}  // extern "C"
