// BZip2 stream codec for the CPU oracle.
//
// Parity: reference crate src/bzip2/ (BZip2Encoder::new(level)/
// BZip2Decoder, [HIGH] names; SURVEY.md §2.1/§3.2-3.3; behavior pinned by
// the public BZip2 stream format). Pipeline per block:
//   RLE1 -> BWT (rotation sort, 24-bit origin ptr) -> MTF -> RLE2
//   (RUNA/RUNB bijective base-2) -> 2..6 Huffman tables with 50-symbol
//   selector groups (selectors MTF'd + unary), delta-coded code lengths,
//   per-block CRC (MSB-first variant) and combined stream CRC.
// All bits MSB-first. The deprecated "randomized" blocks are rejected on
// decode (no modern encoder emits them).
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace tpz {

// level in 1..9 (block budget = level * 100000 post-RLE1 bytes).
void Bzip2Encode(const uint8_t* in, size_t n, int level,
                 std::vector<uint8_t>* out);

// Decodes one or more concatenated streams. Returns 0/1/2 status.
int Bzip2Decode(const uint8_t* in, size_t n, std::vector<uint8_t>* out);

// Device-decode split (tpz/kernels/bzip2_pipeline.py): stage 1 decodes
// every block of one stream to its pre-iBWT last column (status 3 =
// unsupported shape, caller falls back to Bzip2Decode); stage 3 applies
// RLE1^-1 + block CRC checks to the device's iBWT output.
int Bzip2ScanToLast(const uint8_t* in, size_t n, uint8_t* last_blob,
                    int64_t blob_cap, int64_t* offs, int64_t* lens,
                    uint32_t* origs, uint32_t* crcs, int32_t* nblocks);
int Bzip2Rle1Inverse(const uint8_t* bwt_blob, const int64_t* offs,
                     const int64_t* lens, const uint32_t* crcs, int32_t nb,
                     uint8_t* out, size_t* out_len);

// Header-ONLY scan for the all-device decode (round 3): per block of one
// single-stream .bz2, parse through the selector/table section — no
// symbol decode — exporting everything the device symbol walk needs.
// Blocks are delimited by the lbzip2-style magic splitter; a false
// positive surfaces as a header parse error or a downstream CRC miss and
// the caller falls back. Declines (status 3) multi-stream shapes,
// randomized blocks, and code lengths > 17 (neither our encoder nor
// libbzip2 emits them; the device tables use a 15+2-bit split).
// selectors: [cap * kSelCap] table ids; lens: [cap * 6 * 258];
// mtf_init: [cap * 256] initial MTF list (used bytes ascending).
constexpr int kBzSelCap = 18432;
int Bzip2ScanHeaders(const uint8_t* in, size_t n, int32_t cap,
                     int64_t* sym_bits, int64_t* slice_end_bits,
                     uint32_t* origs, uint32_t* crcs, int32_t* n_useds,
                     int32_t* nts, int32_t* nsels, uint8_t* mtf_init,
                     uint8_t* selectors, uint8_t* lens_out,
                     int32_t* nblocks);

}  // namespace tpz

namespace tpz {
// Device-pipeline split points: host RLE1 + block split (with per-block
// CRCs over the ORIGINAL bytes), and final assembly from per-block BWT
// results. BwtEncodeRef is the rotation-sort reference for differential
// tests against tpz/kernels/bwt.py.
int Bzip2Rle1Blocks(const uint8_t* in, size_t n, int level, uint8_t* rle_out,
                    size_t* rle_len, int64_t* block_off, int64_t* block_len,
                    uint32_t* block_crc, int32_t* nblocks);
// Assemble a stream from per-block MTF+RLE2 symbol streams (incl. EOB)
// produced by the device kernels; `used` is nb x 256 bytes of in-use
// flags. Shares EncodeBlockFromMtf with the all-host path bit-for-bit.
int Bzip2AssembleMtf(const uint16_t* mtfv_blob, const int64_t* sym_off,
                     const int32_t* sym_len, const uint8_t* used,
                     const uint32_t* block_crc, const uint32_t* orig_ptrs,
                     int32_t nblocks, int level, std::vector<uint8_t>* out);

int Bzip2Assemble(const uint8_t* bwt_last, const int64_t* block_off,
                  const int64_t* block_len, const uint32_t* block_crc,
                  const uint32_t* orig_ptrs, int32_t nblocks, int level,
                  std::vector<uint8_t>* out);
uint32_t BwtEncodeRef(const uint8_t* in, size_t n, uint8_t* last_out);
// The O(n log^2 n) prefix-doubling rotation sort: the tie-breaking path
// for periodic blocks and the algorithm-independent differential
// reference for the SA-IS fast path inside BwtEncode.
uint32_t BwtEncodeDoubling(const std::vector<uint8_t>& s,
                           std::vector<uint8_t>* last);
}  // namespace tpz
