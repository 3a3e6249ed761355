#include "lzss.h"

#include <algorithm>
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

// Spec-v2 best match, shared by the sequential and per-block tokenizers
// (and mirrored by tpz/kernels/matchfinder.py + parse.py): screen all
// candidates at min(8, cap); fully extend the first n_extend SATURATED
// candidates (recency order) and keep the strictly longest.
template <typename PrevFn>
inline size_t BestMatchCore(const uint8_t* in, size_t n, const LzssParams& p,
                            size_t i, size_t block_end, int64_t head_j,
                            PrevFn prev_at, uint32_t* best_dist) {
  size_t cap = block_end - i;
  if (cap > (size_t)p.max_match) cap = p.max_match;
  if (cap < (size_t)p.min_match || i + (size_t)p.min_match > n) return 0;
  const size_t sb = (size_t)p.screen_bytes;
  size_t screen_cap = cap < sb ? cap : sb;
  if (p.n_extend >= 99) screen_cap = cap;  // full extension (reference mode)
  int64_t j = head_j;
  size_t best_screen = 0;
  int64_t best_j = -1;
  int64_t sats[8];
  int nsat = 0;
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
    if (s >= screen_cap && nsat < 8) sats[nsat++] = j;
    j = prev_at(j);
  }
  if (best_screen < (size_t)p.min_match) return 0;
  size_t best_len = best_screen;
  if (best_screen >= screen_cap) {
    // Spec v2: fully extend the first n_extend saturated candidates
    // (recency order); a later one replaces only when strictly longer.
    // sats[0] == best_j when the screen saturated.
    best_len = MatchLen(in, i, (size_t)best_j, cap);
    int t = p.n_extend < nsat ? p.n_extend : nsat;
    for (int k = 1; k < t && best_len < cap; ++k) {
      size_t len2 = MatchLen(in, i, (size_t)sats[k], cap);
      if (len2 > best_len) {
        best_len = len2;
        best_j = sats[k];
      }
    }
  }
  *best_dist = (uint32_t)(i - (size_t)best_j);
  if (p.too_far_rule && best_len == (size_t)p.min_match &&
      *best_dist > (uint32_t)p.too_far)
    return 0;
  return best_len;
}

// ------------------------------------------------------------------ spec v3
// Suffix-space candidates: every insertable position in the block's halo
// space sorted by its 16-byte prefix (big-endian word order, ties by
// position). A position's candidates are its max_chain nearest sorted
// neighbors in each direction (invalid ones consume their slot, exactly
// like the device's masked vector rolls); winner and runner-up are the
// top-2 by (screen, recency) and both are fully extended when saturated.
struct SuffixSpace {
  std::vector<uint64_t> key[4];   // up to 32-byte BE prefix per local idx
  int nkeys = 2;
  std::vector<int32_t> rank;      // local idx -> sorted rank (-1 absent)
  std::vector<uint32_t> sorted;   // sorted rank -> local idx
  std::vector<uint8_t> adjlcp;    // lcp(sorted[r], sorted[r+1]) capped at
                                  // screen_bytes — candidate screens are
                                  // running minima over these (the host
                                  // twin of the device's sort-payload
                                  // screens), not byte compares
  size_t halo_start = 0;
};

void BuildSuffixSpace(const uint8_t* in, size_t n, const LzssParams& p,
                      size_t halo_start, size_t block_end, SuffixSpace* s) {
  size_t M = block_end - halo_start;
  s->halo_start = halo_start;
  s->nkeys = (p.screen_bytes + 7) / 8;
  if (s->nkeys < 1) s->nkeys = 1;
  if (s->nkeys > 4) s->nkeys = 4;
  for (int w = 0; w < s->nkeys; ++w) s->key[w].assign(M, 0);
  for (size_t k = 0; k < M; ++k) {
    size_t pos = halo_start + k;
    uint8_t buf[32] = {0};
    size_t want = (size_t)s->nkeys * 8;
    size_t avail = n > pos ? (n - pos < want ? n - pos : want) : 0;
    std::memcpy(buf, in + pos, avail);
    for (int w = 0; w < s->nkeys; ++w) {
      uint64_t a;
      std::memcpy(&a, buf + 8 * w, 8);
      s->key[w][k] = __builtin_bswap64(a);
    }
  }
  s->sorted.clear();
  s->sorted.reserve(M);
  for (size_t k = 0; k < M; ++k)
    if (halo_start + k + (size_t)p.min_match <= n)
      s->sorted.push_back((uint32_t)k);
  const int nk = s->nkeys;
  // Sort order: (key[0], key[1], ..., key[nk-1], local idx) ascending.
  // The first 8 bytes almost always decide, so sort those with a stable
  // LSB radix (ties keep insertion order = ascending idx), then refine
  // the rare equal-key0 runs with the remaining words. This is the host
  // encode hot spot: a comparator sort here was ~5 ms per 64 KiB block,
  // 5x the whole match loop at level <= 6.
  {
    struct Rec {  // 8 bytes: half the scatter traffic of {u64,u32}
      uint32_t d;
      uint32_t i;
    };
    const size_t R = s->sorted.size();
    const uint64_t* k0 = s->key[0].data();
    std::vector<Rec> a(R), b(R);
    for (size_t r = 0; r < R; ++r)
      a[r] = {(uint32_t)k0[s->sorted[r]], s->sorted[r]};
    std::vector<uint32_t> cnt(1 << 16);
    Rec* src = a.data();
    Rec* dst = b.data();
    auto lsd2 = [&]() {  // 2 stable 16-bit passes over the 32-bit digit
      for (int pass = 0; pass < 2; ++pass) {
        const int sh = 16 * pass;
        std::fill(cnt.begin(), cnt.end(), 0);
        for (size_t r = 0; r < R; ++r) ++cnt[(src[r].d >> sh) & 0xFFFF];
        uint32_t sum = 0;
        for (size_t c = 0; c < cnt.size(); ++c) {
          uint32_t v = cnt[c];
          cnt[c] = sum;
          sum += v;
        }
        for (size_t r = 0; r < R; ++r)
          dst[cnt[(src[r].d >> sh) & 0xFFFF]++] = src[r];
        std::swap(src, dst);
      }
    };
    lsd2();  // order by low 32 bits of key0 (ties keep ascending idx)
    for (size_t r = 0; r < R; ++r) {  // carry that order into the high half
      src[r].d = (uint32_t)(k0[src[r].i] >> 32);
    }
    lsd2();  // stable on high 32 => full key0 order, ties by idx
    for (size_t r = 0; r < R; ++r) s->sorted[r] = src[r].i;
    if (nk > 1) {
      // Refine equal-key0 runs on (key1.., idx). Pre-gather key1 into a
      // contiguous scratch so the comparator doesn't random-access the
      // key table per compare; deeper words (nk > 2) stay gathered —
      // a run equal through 16 bytes is rare.
      std::vector<std::pair<uint64_t, uint32_t>> run;
      size_t r = 0;
      while (r < R) {
        size_t e = r + 1;
        while (e < R && k0[s->sorted[e]] == k0[s->sorted[r]]) ++e;
        if (e - r > 1) {
          run.clear();
          for (size_t q = r; q < e; ++q)
            run.push_back({s->key[1][s->sorted[q]], s->sorted[q]});
          std::sort(run.begin(), run.end(),
                    [&](const std::pair<uint64_t, uint32_t>& x,
                        const std::pair<uint64_t, uint32_t>& y) {
                      if (x.first != y.first) return x.first < y.first;
                      for (int w = 2; w < nk; ++w)
                        if (s->key[w][x.second] != s->key[w][y.second])
                          return s->key[w][x.second] < s->key[w][y.second];
                      return x.second < y.second;
                    });
          for (size_t q = r; q < e; ++q) s->sorted[q] = run[q - r].second;
        }
        r = e;
      }
    }
  }
  s->rank.assign(M, -1);
  for (size_t r = 0; r < s->sorted.size(); ++r)
    s->rank[s->sorted[r]] = (int32_t)r;
  // Adjacent-LCP table from the key words (exact: keys are zero-padded
  // past n, but every use clamps at screen_cap <= n - i).
  const size_t cap_b = (size_t)p.screen_bytes;
  s->adjlcp.assign(s->sorted.size() ? s->sorted.size() - 1 : 0, 0);
  for (size_t r = 0; r + 1 < s->sorted.size(); ++r) {
    uint32_t x = s->sorted[r], y = s->sorted[r + 1];
    size_t l = cap_b;
    for (int w = 0; w < nk; ++w) {
      uint64_t d = s->key[w][x] ^ s->key[w][y];
      if (d) {
        size_t lw = 8 * (size_t)w + (size_t)(__builtin_clzll(d) >> 3);
        if (lw < l) l = lw;
        break;
      }
    }
    s->adjlcp[r] = (uint8_t)l;
  }
}

size_t BestMatchSuffix(const uint8_t* in, size_t n, const LzssParams& p,
                       const SuffixSpace& S, size_t i, size_t block_end,
                       uint32_t* best_dist) {
  size_t cap = block_end - i;
  if (cap > (size_t)p.max_match) cap = p.max_match;
  if (cap < (size_t)p.min_match || i + (size_t)p.min_match > n) return 0;
  const size_t sb = (size_t)p.screen_bytes;
  const size_t screen_cap = cap < sb ? cap : sb;
  int32_t r0 = S.rank[i - S.halo_start];
  if (r0 < 0) return 0;
  int64_t j1 = -1, j2 = -1;
  size_t s1 = 0, s2 = 0;
  auto consider = [&](int64_t rr, size_t lcp_s) {
    if (rr < 0 || rr >= (int64_t)S.sorted.size()) return;
    size_t j = S.halo_start + S.sorted[(size_t)rr];
    if (j >= i || i - j > (size_t)p.window) return;
    size_t s = lcp_s < screen_cap ? lcp_s : screen_cap;
    if (s > s1 || (s == s1 && (int64_t)j > j1)) {
      s2 = s1;
      j2 = j1;
      s1 = s;
      j1 = (int64_t)j;
    } else if (s > s2 || (s == s2 && (int64_t)j > j2)) {
      s2 = s;
      j2 = (int64_t)j;
    }
  };
  // Screens via running minima over the adjacent-LCP table:
  // lcp(sorted[r0], sorted[r0 +- r]) = min of the adjacent lcps between
  // them, identical to MatchLen(i, j, screen_cap) after the clamp.
  //
  // A direction dies — provably without changing the result — once its
  // running minimum `run` satisfies
  //   run < screen_cap  AND  (run < min_match OR run < s1):
  // run < screen_cap means every remaining candidate there screens
  // UNSATURATED at exactly s = run, so the extension path (which needs
  // s >= screen_cap) is unreachable for it, its s2/j2 updates are inert
  // (extension consults j2 only when s2 >= screen_cap), and it can't
  // beat s1 (run < s1, strict — so no j1 tie updates either). Below
  // min_match it can't become a returned match at all: updates only
  // raise s1/s2, so sub-min_match pollution either stays the maximum —
  // caller gets len 0 either way — or is displaced by a real match.
  size_t run_up = (size_t)p.screen_bytes, run_dn = (size_t)p.screen_bytes;
  bool up_alive = true, dn_alive = true;
  const size_t mm = (size_t)p.min_match;
  for (int r = 1; r <= p.max_chain && (up_alive || dn_alive); ++r) {
    if (up_alive) {
      int64_t up = (int64_t)r0 - r;
      if (up < 0) {
        up_alive = false;
      } else {
        if (S.adjlcp[(size_t)up] < run_up) run_up = S.adjlcp[(size_t)up];
        if (run_up < screen_cap && (run_up < mm || run_up < s1))
          up_alive = false;
        else
          consider(up, run_up);
      }
    }
    if (dn_alive) {
      int64_t dn = (int64_t)r0 + r;
      if ((size_t)dn - 1 >= S.adjlcp.size()) {
        dn_alive = false;
      } else {
        if (S.adjlcp[(size_t)dn - 1] < run_dn) run_dn = S.adjlcp[(size_t)dn - 1];
        if (run_dn < screen_cap && (run_dn < mm || run_dn < s1))
          dn_alive = false;
        else
          consider(dn, run_dn);
      }
    }
  }
  if (j1 < 0 || s1 < (size_t)p.min_match) return 0;
  size_t best_len = s1;
  int64_t best_j = j1;
  if (s1 >= screen_cap) {
    best_len = MatchLen(in, i, (size_t)j1, cap);
    if (p.n_extend >= 2 && j2 >= 0 && s2 >= screen_cap && best_len < cap) {
      size_t len2 = MatchLen(in, i, (size_t)j2, cap);
      if (len2 > best_len) {
        best_len = len2;
        best_j = j2;
      }
    }
  }
  *best_dist = (uint32_t)(i - (size_t)best_j);
  if (p.too_far_rule && best_len == (size_t)p.min_match &&
      *best_dist > (uint32_t)p.too_far)
    return 0;
  return best_len;
}

void TokenizeBlockSuffixMode(const uint8_t* in, size_t n, const LzssParams& p,
                             size_t block_start, size_t block_end,
                             SuffixSpace* space, std::vector<Token>* out) {
  size_t halo_start =
      block_start > (size_t)p.window ? block_start - (size_t)p.window : 0;
  BuildSuffixSpace(in, n, p, halo_start, block_end, space);
  // Restart rule: cap every match so it ends at or before the next
  // restart-aligned sub-boundary (relative to block_start) — the parse
  // chain then provably visits every boundary, so sub-walks are
  // independent (mirrored by parse_extend_pallas_v3w on device).
  const size_t ri = p.restart > 0 ? (size_t)p.restart : 0;
  auto cap_end_at = [&](size_t q) {
    if (!ri) return block_end;
    size_t sub_end = block_start + ((q - block_start) / ri + 1) * ri;
    return sub_end < block_end ? sub_end : block_end;
  };
  size_t i = block_start;
  while (i < block_end) {
    uint32_t dist = 0;
    size_t len = BestMatchSuffix(in, n, p, *space, i, cap_end_at(i), &dist);
    if (p.lazy && len > 0 && (int)len < p.max_lazy && i + 1 < block_end) {
      uint32_t dist2 = 0;
      size_t len2 =
          BestMatchSuffix(in, n, p, *space, i + 1, cap_end_at(i + 1), &dist2);
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

  auto best_match = [&](size_t i, size_t block_end, uint32_t* best_dist) -> size_t {
    // Tail guard (mirrors ensure_inserted_below): Hash3 reads 3 bytes,
    // and no match of min_match >= 3 fits here anyway, so returning 0 is
    // output-identical while avoiding the OOB read (ASan, round 3).
    if (i + 3 > n) return 0;
    uint32_t h = Hash3(in + i, p.hash_bits);
    return BestMatchCore(in, n, p, i, block_end, head[h],
                         [&](int64_t j) { return prev[(size_t)j]; },
                         best_dist);
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
      if (p.lazy && len > 0 && (int)len < p.max_lazy && i + 1 < block_end) {
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
    if (i + 3 > n) return 0;  // tail guard, see LzssTokenizeSeq
    uint32_t h = Hash3(in + i, p.hash_bits);
    return BestMatchCore(in, n, p, i, block_end, (*head)[h],
                         [&](int64_t j) { return prev[(size_t)j - halo_start]; },
                         best_dist);
  };
  size_t i = block_start;
  while (i < block_end) {
    ensure_inserted_below(i);
    uint32_t dist = 0;
    size_t len = best_match(i, &dist);
    if (p.lazy && len > 0 && (int)len < p.max_lazy && i + 1 < block_end) {
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
  if (p.suffix_mode) {
    // Spec v3 is per-block by construction; thread over blocks.
    std::vector<std::vector<Token>> block_tokens(nblocks);
    std::atomic<size_t> next(0);
    auto worker = [&]() {
      SuffixSpace space;
      for (;;) {
        size_t b = next.fetch_add(1);
        if (b >= nblocks) return;
        size_t start = b * bs;
        size_t end = std::min(n, start + bs);
        TokenizeBlockSuffixMode(in, n, p, start, end, &space,
                                &block_tokens[b]);
      }
    };
    unsigned nt = std::min<size_t>(hw, nblocks ? nblocks : 1);
    if (nt <= 1) {
      worker();
    } else {
      std::vector<std::thread> ts;
      for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
      for (auto& t : ts) t.join();
    }
    for (auto& v : block_tokens) out->insert(out->end(), v.begin(), v.end());
    return;
  }
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
