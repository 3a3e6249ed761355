#include "lzss.h"

#include <atomic>
#include <cstdlib>
#include <cstring>
#include <thread>

namespace tpz {

namespace {

inline uint32_t Hash3(const uint8_t* p, int hash_bits) {
  uint32_t v = (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16);
  return (v * 0x9E3779B1u) >> (32 - hash_bits);
}

inline size_t MatchLen(const uint8_t* in, size_t i, size_t j, size_t cap) {
  size_t k = 0;
  while (k + 8 <= cap) {
    uint64_t a, b;
    std::memcpy(&a, in + i + k, 8);
    std::memcpy(&b, in + j + k, 8);
    if (a != b) {
      return k + (size_t)(__builtin_ctzll(a ^ b) >> 3);
    }
    k += 8;
  }
  while (k < cap && in[i + k] == in[j + k]) ++k;
  return k;
}

}  // namespace

// Sequential reference tokenizer (also the small-input path). The
// threaded variant below produces byte-identical tokens: a candidate at
// distance <= window from any position in block B lies inside
// [B.start - window, ...), so a per-block hash table built over exactly
// that halo yields the same "K most recent in-window" candidate sets as
// the global chain — the same argument that makes the device pipeline
// match this oracle.
void LzssTokenizeSeq(const uint8_t* in, size_t n, const LzssParams& p,
                     std::vector<Token>* out) {
  if (n == 0) return;
  out->reserve(out->size() + n / 4);

  std::vector<int64_t> head((size_t)1 << p.hash_bits, -1);
  std::vector<int64_t> prev(n, -1);
  size_t next_insert = 0;

  auto ensure_inserted_below = [&](size_t lim) {
    while (next_insert < lim) {
      if (next_insert + (size_t)p.min_match <= n) {
        uint32_t h = Hash3(in + next_insert, p.hash_bits);
        prev[next_insert] = head[h];
        head[h] = (int64_t)next_insert;
      }
      ++next_insert;
    }
  };

  // Screen+winner rule (shared with tpz/kernels/matchfinder.py): each
  // candidate is scored by its LCP clamped to min(8, cap); the winner is
  // the best screen with ties to the most recent candidate; only the
  // winner is fully extended, and only when its screen is saturated.
  auto best_match = [&](size_t i, size_t block_end, uint32_t* best_dist) -> size_t {
    size_t cap = block_end - i;
    if (cap > (size_t)p.max_match) cap = p.max_match;
    if (cap < (size_t)p.min_match || i + (size_t)p.min_match > n) return 0;
    const size_t screen_cap = cap < 8 ? cap : 8;
    uint32_t h = Hash3(in + i, p.hash_bits);
    int64_t j = head[h];
    size_t best_screen = 0;
    int64_t best_j = -1;
    int cands = 0;
    while (j >= 0 && cands < p.max_chain) {
      size_t dist = i - (size_t)j;
      if (dist > (size_t)p.window) break;  // chain is recency-ordered
      ++cands;
      size_t s = MatchLen(in, i, (size_t)j, screen_cap);
      if (s > best_screen) {  // strict: ties keep the more recent candidate
        best_screen = s;
        best_j = j;
      }
      j = prev[(size_t)j];
    }
    if (best_screen < (size_t)p.min_match) return 0;
    size_t best_len = best_screen;
    if (best_screen >= screen_cap)
      best_len = MatchLen(in, i, (size_t)best_j, cap);
    *best_dist = (uint32_t)(i - (size_t)best_j);
    if (p.too_far_rule && best_len == (size_t)p.min_match &&
        *best_dist > (uint32_t)p.too_far)
      return 0;
    return best_len;
  };

  for (size_t block_start = 0; block_start < n;
       block_start += (size_t)p.block_size) {
    size_t block_end = block_start + (size_t)p.block_size;
    if (block_end > n) block_end = n;
    size_t i = block_start;
    while (i < block_end) {
      ensure_inserted_below(i);
      uint32_t dist = 0;
      size_t len = best_match(i, block_end, &dist);
      if (p.lazy && len > 0 && i + 1 < block_end) {
        ensure_inserted_below(i + 1);
        uint32_t dist2 = 0;
        size_t len2 = best_match(i + 1, block_end, &dist2);
        if (len2 > len) {
          out->push_back(Token{(uint32_t)i, 0, in[i], 0});
          ++i;
          continue;
        }
      }
      if (len > 0) {
        out->push_back(Token{(uint32_t)i, (uint16_t)len, 0, dist});
        i += len;
      } else {
        out->push_back(Token{(uint32_t)i, 0, in[i], 0});
        ++i;
      }
    }
  }
}

namespace {

// One parse block with its own halo-local hash table.
void TokenizeBlock(const uint8_t* in, size_t n, const LzssParams& p,
                   size_t block_start, size_t block_end,
                   std::vector<int64_t>* head, std::vector<Token>* out) {
  size_t halo_start =
      block_start > (size_t)p.window ? block_start - (size_t)p.window : 0;
  std::fill(head->begin(), head->end(), -1);
  std::vector<int64_t> prev(block_end - halo_start, -1);
  size_t next_insert = halo_start;
  auto ensure_inserted_below = [&](size_t lim) {
    while (next_insert < lim) {
      if (next_insert + (size_t)p.min_match <= n) {
        uint32_t h = Hash3(in + next_insert, p.hash_bits);
        prev[next_insert - halo_start] = (*head)[h];
        (*head)[h] = (int64_t)next_insert;
      }
      ++next_insert;
    }
  };
  auto best_match = [&](size_t i, uint32_t* best_dist) -> size_t {
    size_t cap = block_end - i;
    if (cap > (size_t)p.max_match) cap = p.max_match;
    if (cap < (size_t)p.min_match || i + (size_t)p.min_match > n) return 0;
    const size_t screen_cap = cap < 8 ? cap : 8;
    uint32_t h = Hash3(in + i, p.hash_bits);
    int64_t j = (*head)[h];
    size_t best_screen = 0;
    int64_t best_j = -1;
    int cands = 0;
    while (j >= 0 && cands < p.max_chain) {
      size_t dist = i - (size_t)j;
      if (dist > (size_t)p.window) break;
      ++cands;
      size_t s = MatchLen(in, i, (size_t)j, screen_cap);
      if (s > best_screen) {
        best_screen = s;
        best_j = j;
      }
      j = prev[(size_t)j - halo_start];
    }
    if (best_screen < (size_t)p.min_match) return 0;
    size_t best_len = best_screen;
    if (best_screen >= screen_cap)
      best_len = MatchLen(in, i, (size_t)best_j, cap);
    *best_dist = (uint32_t)(i - (size_t)best_j);
    if (p.too_far_rule && best_len == (size_t)p.min_match &&
        *best_dist > (uint32_t)p.too_far)
      return 0;
    return best_len;
  };
  size_t i = block_start;
  while (i < block_end) {
    ensure_inserted_below(i);
    uint32_t dist = 0;
    size_t len = best_match(i, &dist);
    if (p.lazy && len > 0 && i + 1 < block_end) {
      ensure_inserted_below(i + 1);
      uint32_t dist2 = 0;
      size_t len2 = best_match(i + 1, &dist2);
      if (len2 > len) {
        out->push_back(Token{(uint32_t)i, 0, in[i], 0});
        ++i;
        continue;
      }
    }
    if (len > 0) {
      out->push_back(Token{(uint32_t)i, (uint16_t)len, 0, dist});
      i += len;
    } else {
      out->push_back(Token{(uint32_t)i, 0, in[i], 0});
      ++i;
    }
  }
}

}  // namespace

void LzssTokenize(const uint8_t* in, size_t n, const LzssParams& p,
                  std::vector<Token>* out) {
  const size_t bs = (size_t)p.block_size;
  size_t nblocks = (n + bs - 1) / bs;
  unsigned hw = std::thread::hardware_concurrency();
  if (hw < 1) hw = 1;
  if (n == 0 || nblocks <= 1 || hw <= 1 ||
      std::getenv("TPZ_SEQ_LZSS") != nullptr) {
    LzssTokenizeSeq(in, n, p, out);
    return;
  }
  std::vector<std::vector<Token>> block_tokens(nblocks);
  std::atomic<size_t> next(0);
  auto worker = [&]() {
    std::vector<int64_t> head((size_t)1 << p.hash_bits, -1);
    for (;;) {
      size_t b = next.fetch_add(1);
      if (b >= nblocks) return;
      size_t start = b * bs;
      size_t end = std::min(n, start + bs);
      TokenizeBlock(in, n, p, start, end, &head, &block_tokens[b]);
    }
  };
  unsigned nt = std::min<size_t>(hw, nblocks);
  std::vector<std::thread> ts;
  for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  size_t total = 0;
  for (auto& v : block_tokens) total += v.size();
  out->reserve(out->size() + total);
  for (auto& v : block_tokens)
    out->insert(out->end(), v.begin(), v.end());
}

}  // namespace tpz
