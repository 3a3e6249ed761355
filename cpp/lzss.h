// LZSS match finding + parse — the shared "parse spec v1".
//
// Parity: reference crate src/lzss/ (generic LzssEncoder/LzssDecoder
// emitting LzssCode::{Symbol, Reference{len,pos}}, [HIGH] SURVEY.md §2.1).
// The crate's search structure is unknown (SURVEY.md §0.1 Q1); this module
// instead defines OUR deterministic spec, implemented identically here and
// in the TPU kernels (tpz/kernels/matchfinder.py + parse.py) so oracle and
// device produce byte-identical token streams:
//
//   - hash: h(i) = low 3 bytes * 0x9E3779B1 >> (32 - hash_bits)
//   - candidates at i: the first `max_chain` positions j < i with h(j) ==
//     h(i), most recent first, with i - j <= window (all positions are
//     inserted, including inside matches)
//   - screening: each candidate scored by its LCP clamped to min(8, cap)
//     where cap = min(max_match, block_end - i); the winner is the best
//     screen, ties to the more recent candidate
//   - extension: only the winner is extended to its full LCP (capped at
//     cap), and only when its screen is saturated (== min(8, cap))
//   - too-far rule: a match of length == min_match with distance > 4096 is
//     demoted to a literal
//   - parse: greedy per block (lazy=0, the TPU-parity profile) or one-step
//     lazy (lazy=1, host-only "max" profile): if the match starting at i+1
//     is strictly longer than the one at i, emit a literal at i
//   - blocks: the parse restarts at every block boundary (block_size input
//     bytes); matches never cross a block end but distances may reach back
//     across blocks (up to window) — this is what makes per-block device
//     kernels bit-identical to this oracle (SURVEY.md §7 hard part 1)
#pragma once

#include <cstdint>
#include <cstddef>
#include <vector>

namespace tpz {

struct LzssParams {
  int window = 32768;
  int min_match = 3;
  int max_match = 258;
  int max_chain = 16;   // candidate count K
  int hash_bits = 15;
  int block_size = 65536;
  bool lazy = false;
  bool too_far_rule = true;
  int too_far = 4096;
};

// One token: literal (len == 0, lit = byte) or match (len >= min, dist >= 1).
struct Token {
  uint32_t pos;   // input position the token starts at
  uint16_t len;   // 0 for literal
  uint16_t lit;   // literal byte when len == 0
  uint32_t dist;  // match distance when len > 0
};

// Tokenize in[0..n) per the spec above. Appends to `out`.
void LzssTokenize(const uint8_t* in, size_t n, const LzssParams& p,
                  std::vector<Token>* out);

}  // namespace tpz
