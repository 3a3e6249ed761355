// CRC-32 (both variants) + Adler-32 for the CPU oracle.
// Parity: reference crate src/crc32.rs, src/adler32.rs ([MED] SURVEY.md
// §2.1). Table-driven; the tables come from the generated shared-constants
// header so oracle and kernels agree by construction.
#include <cstdint>
#include <cstddef>

#include "generated_constants.h"

namespace tpz {

uint32_t Crc32Reflected(const uint8_t* p, size_t n, uint32_t state) {
  for (size_t i = 0; i < n; ++i)
    state = (state >> 8) ^ kCrcTableReflected[(state ^ p[i]) & 0xff];
  return state;
}

uint32_t Crc32Msb(const uint8_t* p, size_t n, uint32_t state) {
  for (size_t i = 0; i < n; ++i)
    state = (state << 8) ^ kCrcTableMsb[((state >> 24) ^ p[i]) & 0xff];
  return state;
}

uint32_t Adler32(const uint8_t* p, size_t n, uint32_t state) {
  uint32_t a = state & 0xffff, b = (state >> 16) & 0xffff;
  size_t i = 0;
  while (i < n) {
    size_t chunk = n - i;
    if (chunk > 5552) chunk = 5552;
    for (size_t k = 0; k < chunk; ++k) {
      a += p[i + k];
      b += a;
    }
    a %= kAdlerMod;
    b %= kAdlerMod;
    i += chunk;
  }
  return (b << 16) | a;
}

}  // namespace tpz
