// Canonical length-limited Huffman coding for the CPU oracle.
//
// Parity: reference crate src/huffman/ (encoder, decoder, cano_huff_table;
// [MED] SURVEY.md §2.1). Length limiting uses package-merge (optimal,
// SURVEY.md §0.1 Q2 default) with deterministic tie-breaking: items are
// ordered by (weight, leaves-before-packages, lowest symbol). The same
// algorithm and tie-breaks are implemented in tpz/kernels/huffman.py; the
// two are differential-tested for equality so device and oracle cannot
// drift.
#pragma once

#include <cstdint>
#include <vector>

namespace tpz {

// freqs[nsyms] -> lengths[nsyms] with max length <= limit.
// Symbols with freq 0 get length 0. A single used symbol gets length 1.
// Returns false if impossible (nsyms > 2^limit actives).
bool PackageMergeLengths(const uint32_t* freqs, int nsyms, int limit,
                         uint8_t* lengths);

// Canonical code assignment (RFC 1951 §3.2.2): codes in increasing order of
// (length, symbol). codes[i] is the MSB-first code value of length
// lengths[i]; 0 for unused symbols. 32-bit: bzip2 allows lengths up to 20
// (a uint16 code type silently truncated 17+-bit codes — real bug found by
// the 16 MiB fuzz pass, see tests/test_bzip2.py::test_large_block).
void CanonicalCodes(const uint8_t* lengths, int nsyms, uint32_t* codes);

// Single-level decode table yielding packed (symbol << 5) | code_length.
// Invalid entries have length 0.
//
// Two index layouts:
//  - MSB streams (bzip2/lzhuf): index = next `bits` stream bits read
//    MSB-first; a code occupies [code << (bits-len), +2^(bits-len)).
//  - LSB streams (DEFLATE): index = next `bits` stream bits read LSB-first;
//    a code occupies indices {bitrev(code,len) + (k << len)}.
struct HuffDecodeTable {
  std::vector<uint32_t> entries;  // size 1 << bits
  int bits = 0;                   // max code length in this tree
  bool complete = false;          // Kraft sum exactly full
};

// Build a decode table from code lengths. Returns false on over-subscribed
// lengths (Kraft sum > 1). Under-subscribed (incomplete) trees are allowed
// and flagged via `complete`; invalid codes decode to entries with len 0.
bool BuildDecodeTable(const uint8_t* lengths, int nsyms, bool lsb_stream,
                      HuffDecodeTable* t);

}  // namespace tpz
