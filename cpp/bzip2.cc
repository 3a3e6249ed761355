#include "bzip2.h"

#include <algorithm>
#include <atomic>
#include <cstring>
#include <thread>

#include "bitio.h"
#include "generated_constants.h"
#include "huffman.h"

namespace tpz {

uint32_t Crc32Msb(const uint8_t*, size_t, uint32_t);

namespace {

constexpr int kStatusOk = 0;
constexpr int kStatusDataError = 1;
constexpr int kStatusUnexpectedEof = 2;
constexpr int kStatusUnexpected = 3;
constexpr int kStatusBufferTooSmall = 4;

constexpr int kGroupSize = 50;
constexpr int kCodeLenLimit = 17;   // encoder limit (format allows 20)
constexpr int kMaxCodeLen = 20;     // decoder tolerance
constexpr int kNIters = 4;
constexpr uint64_t kBlockMagic = 0x314159265359ULL;
constexpr uint64_t kEosMagic = 0x177245385090ULL;

// ---------------------------------------------------------------- RLE1

// Encode a run-limited RLE1 unit stream. Each "unit" is either a literal
// byte (1 source byte -> 1 output byte) or a run unit (4..259 source bytes
// -> 4 bytes + count). Returns units so the block splitter never cuts one.
struct Rle1Unit {
  uint32_t src_len;
  uint8_t out_len;
  uint8_t byte;     // the repeated/literal byte
  uint8_t count;    // run count byte (out_len == 5 only)
};

void Rle1Units(const uint8_t* in, size_t n, std::vector<Rle1Unit>* units) {
  size_t i = 0;
  while (i < n) {
    uint8_t b = in[i];
    size_t run = 1;
    while (i + run < n && run < 259 && in[i + run] == b) ++run;
    if (run >= 4) {
      units->push_back({(uint32_t)run, 5, b, (uint8_t)(run - 4)});
      i += run;
    } else {
      for (size_t k = 0; k < run; ++k) units->push_back({1, 1, b, 0});
      i += run;
    }
  }
}

// ------------------------------------------------------------------- BWT

// Sort all rotations of s (cyclic prefix-doubling, O(n log^2 n)).
// Ties between identical rotations (periodic inputs) break by rotation
// index — the same rule as the device kernel (tpz/kernels/bwt.py), so the
// two produce identical (last, origPtr) pairs.
// Returns the last column in `last` and the origin pointer.
// Kept as (a) the tie-breaking path for periodic blocks and (b) an
// algorithm-independent differential reference for BwtEncodeSais.
uint32_t BwtDoublingImpl(const std::vector<uint8_t>& s,
                         std::vector<uint8_t>* last) {
  const int n = (int)s.size();
  std::vector<int> sa(n), rank(n), tmp(n);
  for (int i = 0; i < n; ++i) {
    sa[i] = i;
    rank[i] = s[i];
  }
  for (int k = 1;; k <<= 1) {
    // Content-only comparison: drives rank assignment.
    auto content_less = [&](int a, int b) {
      if (rank[a] != rank[b]) return rank[a] < rank[b];
      return rank[(a + k) % n] < rank[(b + k) % n];
    };
    // Order comparison: content, then rotation index (determinism).
    auto cmp = [&](int a, int b) {
      if (content_less(a, b)) return true;
      if (content_less(b, a)) return false;
      return a < b;
    };
    std::sort(sa.begin(), sa.end(), cmp);
    tmp[sa[0]] = 0;
    for (int i = 1; i < n; ++i)
      tmp[sa[i]] = tmp[sa[i - 1]] + (content_less(sa[i - 1], sa[i]) ? 1 : 0);
    rank = tmp;
    if (rank[sa[n - 1]] == n - 1) break;
    if (k > n) break;  // ties are only between identical rotations now
  }
  last->resize(n);
  uint32_t orig = 0;
  for (int i = 0; i < n; ++i) {
    int j = sa[i];
    (*last)[i] = s[(j + n - 1) % n];
    if (j == 0) orig = (uint32_t)i;
  }
  return orig;
}

// Linear-time suffix array by induced sorting (the SA-IS scheme of
// Nong, Zhang & Chan 2009; implementation written from the published
// algorithm description). s[0..n-1] over alphabet [0, K) where s[n-1]
// is the unique smallest sentinel (value 0, occurring once). On return
// sa[] holds the suffix start positions in lexicographic order.
static void SaIs(const int32_t* s, int32_t* sa, int32_t n, int32_t K) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  // Type classification: S if the suffix at i sorts below the suffix at
  // i+1. The sentinel suffix is S by convention. (uint8_t, not
  // vector<bool>: the induced-sort inner loops are random-access-bound.)
  std::vector<uint8_t> is_s(n);
  is_s[n - 1] = 1;
  for (int32_t i = n - 2; i >= 0; --i)
    is_s[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && is_s[i + 1]);
  auto is_lms = [&](int32_t i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<int32_t> bkt(K, 0), ptr(K);
  for (int32_t i = 0; i < n; ++i) ++bkt[s[i]];
  auto bkt_ends = [&]() {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) {
      sum += bkt[c];
      ptr[c] = sum;
    }
  };
  auto bkt_starts = [&]() {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) {
      ptr[c] = sum;
      sum += bkt[c];
    }
  };
  // Induced sort: assumes LMS suffixes are already placed at bucket
  // ends; fills in L suffixes left-to-right, then (re-)places every S
  // suffix right-to-left.
  auto induce = [&]() {
    bkt_starts();
    for (int32_t i = 0; i < n; ++i) {
      int32_t j = sa[i] - 1;
      if (sa[i] > 0 && !is_s[j]) sa[ptr[s[j]]++] = j;
    }
    bkt_ends();
    for (int32_t i = n - 1; i >= 0; --i) {
      int32_t j = sa[i] - 1;
      if (sa[i] > 0 && is_s[j]) sa[--ptr[s[j]]] = j;
    }
  };

  // Stage 1: sort the LMS substrings — place LMS positions at bucket
  // ends in any order, induce, then name adjacent LMS substrings.
  std::fill(sa, sa + n, -1);
  bkt_ends();
  for (int32_t i = 1; i < n; ++i)
    if (is_lms(i)) sa[--ptr[s[i]]] = i;
  induce();

  std::vector<int32_t> lms_sorted;
  lms_sorted.reserve(n / 2 + 1);
  for (int32_t i = 0; i < n; ++i)
    if (sa[i] > 0 && is_lms(sa[i])) lms_sorted.push_back(sa[i]);
  const int32_t m = (int32_t)lms_sorted.size();

  // Name LMS substrings (chars + types up to and including the next LMS
  // position decide equality). name[] is sparse over positions.
  std::vector<int32_t> name(n, -1);
  int32_t cur = 0;
  name[lms_sorted[0]] = 0;  // the sentinel's LMS substring, unique min
  for (int32_t i = 1; i < m; ++i) {
    int32_t a = lms_sorted[i - 1], b = lms_sorted[i];
    bool same = true;
    for (int32_t d = 0;; ++d) {
      if (s[a + d] != s[b + d] || is_s[a + d] != is_s[b + d]) {
        same = false;
        break;
      }
      if (d > 0 && (is_lms(a + d) || is_lms(b + d))) {
        same = is_lms(a + d) && is_lms(b + d);
        break;
      }
    }
    if (!same) ++cur;
    name[b] = cur;
  }

  // Reduced string: names in LMS position order.
  std::vector<int32_t> s1, lms_pos;
  s1.reserve(m);
  lms_pos.reserve(m);
  for (int32_t i = 1; i < n; ++i)
    if (is_lms(i)) {
      lms_pos.push_back(i);
      s1.push_back(name[i]);
    }
  std::vector<int32_t> sa1(m);
  if (cur + 1 == m) {
    for (int32_t i = 0; i < m; ++i) sa1[s1[i]] = i;
  } else {
    SaIs(s1.data(), sa1.data(), m, cur + 1);
  }

  // Stage 2: place the now fully sorted LMS suffixes at bucket ends
  // (right-to-left keeps within-bucket order) and induce the rest.
  std::fill(sa, sa + n, -1);
  bkt_ends();
  for (int32_t i = m - 1; i >= 0; --i) {
    int32_t p = lms_pos[sa1[i]];
    sa[--ptr[s[p]]] = p;
  }
  induce();
}

// Smallest period of s via the KMP failure function; s is periodic
// (some rotation equals another) iff period < n and period | n.
static bool IsPeriodic(const std::vector<uint8_t>& s) {
  const int32_t n = (int32_t)s.size();
  std::vector<int32_t> f(n, 0);
  for (int32_t i = 1; i < n; ++i) {
    int32_t k = f[i - 1];
    while (k && s[i] != s[k]) k = f[k - 1];
    if (s[i] == s[k]) ++k;
    f[i] = k;
  }
  const int32_t p = n - f[n - 1];
  return p < n && n % p == 0;
}

// BWT of the cyclic rotations of s via one SA-IS pass over s·s + a
// sentinel: for primitive (non-periodic) s, distinct rotations differ
// within their first n characters, so the suffix order of the doubled
// string restricted to start positions < n IS the rotation order.
// Periodic blocks (the only case with rotation ties, where the format
// contract is index-ascending tie-break, matching tpz/kernels/bwt.py)
// take the prefix-doubling path — O(n) to detect, vanishingly rare at
// 900k block sizes.
uint32_t BwtEncode(const std::vector<uint8_t>& s, std::vector<uint8_t>* last) {
  const int32_t n = (int32_t)s.size();
  if (n <= 1) return BwtDoublingImpl(s, last);
  if (IsPeriodic(s)) return BwtDoublingImpl(s, last);
  const int32_t N = 2 * n + 1;
  std::vector<int32_t> t(N), sa(N);
  for (int32_t i = 0; i < 2 * n; ++i) t[i] = (int32_t)s[i % n] + 1;
  t[N - 1] = 0;
  SaIs(t.data(), sa.data(), N, 257);
  last->resize(n);
  uint32_t orig = 0;
  int32_t w = 0;
  for (int32_t i = 0; i < N; ++i) {
    int32_t j = sa[i];
    if (j >= n) continue;  // second-copy suffixes and the sentinel
    (*last)[w] = s[(j + n - 1) % n];
    if (j == 0) orig = (uint32_t)w;
    ++w;
  }
  return orig;
}

// ---------------------------------------------------------------- encode

void EncodeBlockFromMtf(const uint16_t* mtfv_in, int n_mtf_in,
                        const bool in_use[256], uint32_t orig,
                        uint32_t block_crc, BitWriterMSB* bw);

void EncodeBlockPostBwt(const std::vector<uint8_t>& last_in, uint32_t orig,
                        uint32_t block_crc, BitWriterMSB* bw) {
  const std::vector<uint8_t>& last = last_in;
  const int n = (int)last.size();
  (void)n;

  // Used-symbol map + MTF + RLE2.
  bool in_use[256] = {false};
  for (uint8_t b : last) in_use[b] = true;
  uint8_t seq_to_unseq[256];
  int n_used = 0;
  for (int i = 0; i < 256; ++i)
    if (in_use[i]) seq_to_unseq[n_used++] = (uint8_t)i;
  uint8_t unseq_to_seq[256];
  for (int i = 0; i < n_used; ++i) unseq_to_seq[seq_to_unseq[i]] = (uint8_t)i;

  const int eob = n_used + 1;
  std::vector<uint16_t> mtfv;  // RLE2 symbol stream incl. EOB
  mtfv.reserve(last.size() + 16);
  {
    uint8_t order[256];
    for (int i = 0; i < n_used; ++i) order[i] = (uint8_t)i;
    int zero_run = 0;
    auto flush_run = [&](void) {
      int r = zero_run;
      // bijective base-2: r+1 in binary, low bits first, drop the top 1.
      while (r > 0) {
        if ((r - 1) & 1) {
          mtfv.push_back(1);  // RUNB
          r = (r - 2) / 2;
        } else {
          mtfv.push_back(0);  // RUNA
          r = (r - 1) / 2;
        }
      }
      zero_run = 0;
    };
    for (uint8_t b : last) {
      uint8_t v = unseq_to_seq[b];
      if (order[0] == v) {
        ++zero_run;
        continue;
      }
      flush_run();
      int j = 0;
      while (order[j] != v) ++j;
      std::memmove(order + 1, order, j);
      order[0] = v;
      mtfv.push_back((uint16_t)(j + 1));
    }
    flush_run();
    mtfv.push_back((uint16_t)eob);
  }
  EncodeBlockFromMtf(mtfv.data(), (int)mtfv.size(), in_use, orig,
                     block_crc, bw);
}

// Second half of the block encoder: multi-table Huffman with greedy
// selector refinement + emission, from an MTF+RLE2 symbol stream (incl.
// the EOB symbol). Split out so the device pipeline can hand over its
// kernel-produced mtfv (tpz/kernels/mtf.py + rle.py) and share the coder
// bit-for-bit with the all-host path.
void EncodeBlockFromMtf(const uint16_t* mtfv_in, int n_mtf_in,
                        const bool in_use[256], uint32_t orig,
                        uint32_t block_crc, BitWriterMSB* bw) {
  int n_used = 0;
  for (int i = 0; i < 256; ++i)
    if (in_use[i]) ++n_used;
  const int alpha = n_used + 2;
  const std::vector<uint16_t> mtfv(mtfv_in, mtfv_in + n_mtf_in);
  const int n_mtf = n_mtf_in;

  // Choose table count (bzip2's thresholds).
  int n_tables;
  if (n_mtf < 200) n_tables = 2;
  else if (n_mtf < 600) n_tables = 3;
  else if (n_mtf < 1200) n_tables = 4;
  else if (n_mtf < 2400) n_tables = 5;
  else n_tables = 6;

  const int n_sel = (n_mtf + kGroupSize - 1) / kGroupSize;
  std::vector<uint8_t> selector(n_sel);
  std::vector<std::vector<uint8_t>> lens(
      n_tables, std::vector<uint8_t>(alpha, 15));

  // Initial partition by cumulative frequency (bzip2-style).
  {
    std::vector<uint32_t> freq(alpha, 0);
    for (uint16_t v : mtfv) ++freq[v];
    int rem_sym = alpha, rem_tab = n_tables, gs = 0;
    int total = n_mtf;
    int acc_lo = 0;
    for (int t = n_tables - 1; t >= 0; --t) {
      int target = total / (t + 1);
      int acc = 0, hi = acc_lo;
      while (hi < alpha && (acc < target || hi == acc_lo)) {
        acc += (int)freq[hi++];
      }
      for (int s = 0; s < alpha; ++s)
        lens[n_tables - 1 - t][s] =
            (s >= acc_lo && s < hi) ? 0 : 15;
      total -= acc;
      acc_lo = hi;
      (void)rem_sym;
      (void)rem_tab;
      (void)gs;
    }
    // convert 0/15 marker lengths into real initial lengths
    for (int t = 0; t < n_tables; ++t)
      for (int s = 0; s < alpha; ++s)
        lens[t][s] = lens[t][s] == 0 ? 2 : 15;
  }

  std::vector<std::vector<uint32_t>> codes(
      n_tables, std::vector<uint32_t>(alpha, 0));

  // Iterated refinement: assign each group to the cheapest table, then
  // rebuild each table from its groups' frequencies.
  for (int iter = 0; iter < kNIters; ++iter) {
    std::vector<std::vector<uint32_t>> tfreq(
        n_tables, std::vector<uint32_t>(alpha, 0));
    for (int g = 0; g < n_sel; ++g) {
      int lo = g * kGroupSize;
      int hi = std::min(n_mtf, lo + kGroupSize);
      uint32_t best_cost = 0xffffffff;
      int best_t = 0;
      for (int t = 0; t < n_tables; ++t) {
        uint32_t cost = 0;
        for (int i = lo; i < hi; ++i) cost += lens[t][mtfv[i]];
        if (cost < best_cost) {
          best_cost = cost;
          best_t = t;
        }
      }
      selector[g] = (uint8_t)best_t;
      for (int i = lo; i < hi; ++i) ++tfreq[best_t][mtfv[i]];
    }
    for (int t = 0; t < n_tables; ++t) {
      // +1 on every freq: the delta length coding cannot express an
      // unused symbol, so all symbols need a code in all tables.
      std::vector<uint32_t> f(alpha);
      for (int s = 0; s < alpha; ++s) f[s] = tfreq[t][s] + 1;
      PackageMergeLengths(f.data(), alpha, kCodeLenLimit, lens[t].data());
      CanonicalCodes(lens[t].data(), alpha, codes[t].data());
    }
  }

  // ---- emit ----
  bw->Write((uint32_t)(kBlockMagic >> 24), 24);
  bw->Write((uint32_t)(kBlockMagic & 0xffffff), 24);
  bw->Write(block_crc, 32);
  bw->Write(0, 1);  // randomized = no
  bw->Write(orig, 24);
  // used map
  uint16_t used16 = 0;
  for (int i = 0; i < 16; ++i)
    for (int j = 0; j < 16; ++j)
      if (in_use[16 * i + j]) used16 |= (uint16_t)(1 << (15 - i));
  bw->Write(used16, 16);
  for (int i = 0; i < 16; ++i) {
    if (!(used16 & (1 << (15 - i)))) continue;
    uint16_t m = 0;
    for (int j = 0; j < 16; ++j)
      if (in_use[16 * i + j]) m |= (uint16_t)(1 << (15 - j));
    bw->Write(m, 16);
  }
  bw->Write((uint32_t)n_tables, 3);
  bw->Write((uint32_t)n_sel, 15);
  // selectors, MTF'd over table ids, unary
  {
    uint8_t order[6];
    for (int i = 0; i < n_tables; ++i) order[i] = (uint8_t)i;
    for (int g = 0; g < n_sel; ++g) {
      uint8_t v = selector[g];
      int j = 0;
      while (order[j] != v) ++j;
      std::memmove(order + 1, order, j);
      order[0] = v;
      for (int k = 0; k < j; ++k) bw->Write(1, 1);
      bw->Write(0, 1);
    }
  }
  // tables: 5-bit start, then delta steps
  for (int t = 0; t < n_tables; ++t) {
    int cur = lens[t][0];
    bw->Write((uint32_t)cur, 5);
    for (int s = 0; s < alpha; ++s) {
      int target = lens[t][s];
      while (cur < target) {
        bw->Write(2, 2);  // "10" increment
        ++cur;
      }
      while (cur > target) {
        bw->Write(3, 2);  // "11" decrement
        --cur;
      }
      bw->Write(0, 1);
    }
  }
  // symbol stream
  for (int g = 0; g < n_sel; ++g) {
    int t = selector[g];
    int lo = g * kGroupSize;
    int hi = std::min(n_mtf, lo + kGroupSize);
    for (int i = lo; i < hi; ++i) {
      uint16_t v = mtfv[i];
      bw->WriteHuff(codes[t][v], lens[t][v]);
    }
  }
}

}  // namespace

void Bzip2Encode(const uint8_t* in, size_t n, int level,
                 std::vector<uint8_t>* out) {
  if (level < 1) level = 1;
  if (level > 9) level = 9;
  const size_t limit = (size_t)level * 100000;
  BitWriterMSB bw;
  bw.Write('B', 8);
  bw.Write('Z', 8);
  bw.Write('h', 8);
  bw.Write('0' + level, 8);

  std::vector<Rle1Unit> units;
  Rle1Units(in, n, &units);

  // Collect RLE1 blocks, then encode them in parallel (blocks are
  // independent by format — the same property the TPU pipeline shards on)
  // and splice the resulting bit streams in order.
  struct BlockJob {
    std::vector<uint8_t> data;
    uint32_t crc;
    BitWriterMSB bits;
  };
  std::vector<BlockJob> jobs;
  {
    size_t u = 0, src_pos = 0;
    while (u < units.size()) {
      BlockJob job;
      job.data.reserve(std::min(limit, n + 16));
      size_t src_len = 0;
      while (u < units.size() && job.data.size() + units[u].out_len <= limit) {
        const Rle1Unit& un = units[u];
        if (un.out_len == 1) {
          job.data.push_back(un.byte);
        } else {
          for (int k = 0; k < 4; ++k) job.data.push_back(un.byte);
          job.data.push_back(un.count);
        }
        src_len += un.src_len;
        ++u;
      }
      job.crc = Crc32Msb(in + src_pos, src_len, 0xFFFFFFFF) ^ 0xFFFFFFFF;
      src_pos += src_len;
      jobs.push_back(std::move(job));
    }
  }
  {
    std::atomic<size_t> next(0);
    auto worker = [&]() {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= jobs.size()) return;
        std::vector<uint8_t> lastcol;
        uint32_t orig = BwtEncode(jobs[i].data, &lastcol);
        EncodeBlockPostBwt(lastcol, orig, jobs[i].crc, &jobs[i].bits);
      }
    };
    unsigned nt = std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if (nt > jobs.size()) nt = (unsigned)jobs.size();
    if (nt <= 1) {
      worker();
    } else {
      std::vector<std::thread> ts;
      for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
      for (auto& t : ts) t.join();
    }
  }
  uint32_t combined = 0;
  for (auto& job : jobs) {
    combined = ((combined << 1) | (combined >> 31)) ^ job.crc;
    job.bits.AppendTo(&bw);
  }
  bw.Write((uint32_t)(kEosMagic >> 24), 24);
  bw.Write((uint32_t)(kEosMagic & 0xffffff), 24);
  bw.Write(combined, 32);
  bw.AlignByte();
  *out = std::move(bw.bytes());
}

// ---- device-pipeline split points (see tpz/kernels/bzip2_pipeline.py) ----

int Bzip2Rle1Blocks(const uint8_t* in, size_t n, int level, uint8_t* rle_out,
                    size_t* rle_len, int64_t* block_off, int64_t* block_len,
                    uint32_t* block_crc, int32_t* nblocks) {
  if (level < 1) level = 1;
  if (level > 9) level = 9;
  const size_t limit = (size_t)level * 100000;
  std::vector<Rle1Unit> units;
  Rle1Units(in, n, &units);
  size_t u = 0, src_pos = 0, out_pos = 0;
  int nb = 0;
  const int cap_blocks = *nblocks;
  const size_t cap_out = *rle_len;
  while (u < units.size()) {
    if (nb >= cap_blocks) return 4;
    size_t start = out_pos, src_len = 0;
    while (u < units.size() && out_pos - start + units[u].out_len <= limit) {
      const Rle1Unit& un = units[u];
      if (out_pos + un.out_len > cap_out) return 4;
      if (un.out_len == 1) {
        rle_out[out_pos++] = un.byte;
      } else {
        for (int k = 0; k < 4; ++k) rle_out[out_pos++] = un.byte;
        rle_out[out_pos++] = un.count;
      }
      src_len += un.src_len;
      ++u;
    }
    block_off[nb] = (int64_t)start;
    block_len[nb] = (int64_t)(out_pos - start);
    block_crc[nb] =
        Crc32Msb(in + src_pos, src_len, 0xFFFFFFFF) ^ 0xFFFFFFFF;
    src_pos += src_len;
    ++nb;
  }
  *nblocks = nb;
  *rle_len = out_pos;
  return 0;
}

int Bzip2Assemble(const uint8_t* bwt_last, const int64_t* block_off,
                  const int64_t* block_len, const uint32_t* block_crc,
                  const uint32_t* orig_ptrs, int32_t nblocks, int level,
                  std::vector<uint8_t>* out) {
  if (level < 1) level = 1;
  if (level > 9) level = 9;
  BitWriterMSB bw;
  bw.Write('B', 8);
  bw.Write('Z', 8);
  bw.Write('h', 8);
  bw.Write('0' + level, 8);
  std::vector<BitWriterMSB> block_bits(nblocks);
  {
    std::atomic<int32_t> next(0);
    auto worker = [&]() {
      for (;;) {
        int32_t b = next.fetch_add(1);
        if (b >= nblocks) return;
        std::vector<uint8_t> last(bwt_last + block_off[b],
                                  bwt_last + block_off[b] + block_len[b]);
        EncodeBlockPostBwt(last, orig_ptrs[b], block_crc[b], &block_bits[b]);
      }
    };
    unsigned nt = std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if ((int)nt > nblocks) nt = (unsigned)nblocks;
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  uint32_t combined = 0;
  for (int b = 0; b < nblocks; ++b) {
    combined = ((combined << 1) | (combined >> 31)) ^ block_crc[b];
    block_bits[b].AppendTo(&bw);
  }
  bw.Write((uint32_t)(kEosMagic >> 24), 24);
  bw.Write((uint32_t)(kEosMagic & 0xffffff), 24);
  bw.Write(combined, 32);
  bw.AlignByte();
  *out = std::move(bw.bytes());
  return 0;
}

int Bzip2AssembleMtf(const uint16_t* mtfv_blob, const int64_t* sym_off,
                     const int32_t* sym_len, const uint8_t* used,
                     const uint32_t* block_crc, const uint32_t* orig_ptrs,
                     int32_t nblocks, int level, std::vector<uint8_t>* out) {
  if (level < 1) level = 1;
  if (level > 9) level = 9;
  BitWriterMSB bw;
  bw.Write('B', 8);
  bw.Write('Z', 8);
  bw.Write('h', 8);
  bw.Write('0' + level, 8);
  std::vector<BitWriterMSB> block_bits(nblocks);
  {
    std::atomic<int32_t> next(0);
    auto worker = [&]() {
      for (;;) {
        int32_t b = next.fetch_add(1);
        if (b >= nblocks) return;
        bool in_use[256];
        for (int i = 0; i < 256; ++i) in_use[i] = used[256 * b + i] != 0;
        EncodeBlockFromMtf(mtfv_blob + sym_off[b], sym_len[b], in_use,
                           orig_ptrs[b], block_crc[b], &block_bits[b]);
      }
    };
    unsigned nt = std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if ((int)nt > nblocks) nt = (unsigned)nblocks;
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  uint32_t combined = 0;
  for (int b = 0; b < nblocks; ++b) {
    combined = ((combined << 1) | (combined >> 31)) ^ block_crc[b];
    block_bits[b].AppendTo(&bw);
  }
  bw.Write((uint32_t)(kEosMagic >> 24), 24);
  bw.Write((uint32_t)(kEosMagic & 0xffffff), 24);
  bw.Write(combined, 32);
  bw.AlignByte();
  *out = std::move(bw.bytes());
  return 0;
}

uint32_t BwtEncodeRef(const uint8_t* in, size_t n, uint8_t* last_out) {
  std::vector<uint8_t> s(in, in + n);
  std::vector<uint8_t> last;
  uint32_t orig = BwtEncode(s, &last);
  std::memcpy(last_out, last.data(), n);
  return orig;
}

uint32_t BwtEncodeDoubling(const std::vector<uint8_t>& s,
                           std::vector<uint8_t>* last) {
  return BwtDoublingImpl(s, last);
}

// ------------------------------------------------------------------ decode

namespace {

// bzip2 RLE1 inverse over a decoded (post-iBWT) block.
int Rle1Inverse(const uint8_t* bwt_out, size_t bn,
                std::vector<uint8_t>* plain) {
  size_t i = 0;
  while (i < bn) {
    uint8_t b = bwt_out[i];
    size_t run = 1;
    while (i + run < bn && run < 4 && bwt_out[i + run] == b) ++run;
    plain->insert(plain->end(), run, b);
    i += run;
    if (run == 4) {
      if (i >= bn) return kStatusUnexpectedEof;
      plain->insert(plain->end(), bwt_out[i], b);
      ++i;
    }
  }
  return kStatusOk;
}

// First half of a block decode: everything through RLE2^-1 + MTF^-1,
// producing the BWT last column (the pre-iBWT split point used by the
// device decode path, tpz/kernels/bzip2_pipeline.py).
int DecodeBlockToLast(BitReaderMSB* br, std::vector<uint8_t>* last_out,
                      uint32_t* orig_out, uint32_t* block_crc_out) {
  uint32_t crc = br->Read(32);
  *block_crc_out = crc;
  uint32_t randomized = br->Read(1);
  if (randomized) return kStatusDataError;  // deprecated, unsupported
  uint32_t orig = br->Read(24);
  if (br->Overrun()) return kStatusUnexpectedEof;

  uint8_t seq_to_unseq[256];
  int n_used = 0;
  uint16_t used16 = (uint16_t)br->Read(16);
  for (int i = 0; i < 16; ++i) {
    if (!(used16 & (1 << (15 - i)))) continue;
    uint16_t m = (uint16_t)br->Read(16);
    for (int j = 0; j < 16; ++j)
      if (m & (1 << (15 - j))) seq_to_unseq[n_used++] = (uint8_t)(16 * i + j);
  }
  if (br->Overrun()) return kStatusUnexpectedEof;
  if (n_used == 0) return kStatusDataError;
  const int alpha = n_used + 2;
  const int eob = n_used + 1;

  int n_tables = (int)br->Read(3);
  int n_sel = (int)br->Read(15);
  if (n_tables < 2 || n_tables > 6 || n_sel < 1) return kStatusDataError;
  std::vector<uint8_t> selector(n_sel);
  {
    uint8_t order[6];
    for (int i = 0; i < n_tables; ++i) order[i] = (uint8_t)i;
    for (int g = 0; g < n_sel; ++g) {
      int j = 0;
      while (br->Read(1) == 1) {
        ++j;
        if (j >= n_tables) return kStatusDataError;
        if (br->Overrun()) return kStatusUnexpectedEof;
      }
      uint8_t v = order[j];
      std::memmove(order + 1, order, j);
      order[0] = v;
      selector[g] = v;
    }
  }
  if (br->Overrun()) return kStatusUnexpectedEof;

  std::vector<HuffDecodeTable> tabs(n_tables);
  for (int t = 0; t < n_tables; ++t) {
    std::vector<uint8_t> lens(alpha);
    int cur = (int)br->Read(5);
    for (int s = 0; s < alpha; ++s) {
      for (;;) {
        if (cur < 1 || cur > kMaxCodeLen) return kStatusDataError;
        if (br->Read(1) == 0) break;
        if (br->Read(1) == 0) ++cur;
        else --cur;
        if (br->Overrun()) return kStatusUnexpectedEof;
      }
      lens[s] = (uint8_t)cur;
    }
    if (br->Overrun()) return kStatusUnexpectedEof;
    if (!BuildDecodeTable(lens.data(), alpha, /*lsb=*/false, &tabs[t]) ||
        tabs[t].bits == 0)
      return kStatusDataError;
  }

  // Symbol stream -> RLE2^-1 + MTF^-1 -> BWT last column.
  std::vector<uint8_t>& last = *last_out;
  last.clear();
  {
    uint8_t order[256];
    for (int i = 0; i < n_used; ++i) order[i] = seq_to_unseq[i];
    int g = -1, gpos = 0, t = 0;
    int64_t zero_run = 0, zbit = 0;
    for (;;) {
      if (gpos == 0) {
        ++g;
        if (g >= n_sel) return kStatusDataError;
        t = selector[g];
        gpos = kGroupSize;
      }
      --gpos;
      const HuffDecodeTable& tab = tabs[t];
      uint32_t e = tab.entries[br->Peek(tab.bits)];
      int len = (int)(e & 0x1f);
      if (len == 0) return kStatusDataError;
      br->Consume(len);
      if (br->Overrun()) return kStatusUnexpectedEof;
      int sym = (int)(e >> 5);
      if (sym == 0 || sym == 1) {  // RUNA / RUNB
        zero_run += (int64_t)(sym + 1) << zbit;
        ++zbit;
        continue;
      }
      if (zero_run > 0) {
        if ((size_t)zero_run > (size_t)100000 * 10) return kStatusDataError;
        last.insert(last.end(), (size_t)zero_run, order[0]);
        zero_run = 0;
        zbit = 0;
      }
      if (sym == eob) break;
      if (sym > eob) return kStatusDataError;
      int j = sym - 1;  // MTF index
      uint8_t v = order[j];
      std::memmove(order + 1, order, j);
      order[0] = v;
      last.push_back(v);
      if (last.size() > (size_t)9 * 100000 + 10) return kStatusDataError;
    }
  }
  if (last.empty()) return kStatusDataError;
  if (orig >= last.size()) return kStatusDataError;
  *orig_out = orig;
  return kStatusOk;
}

// Second half: inverse BWT + RLE1^-1 (shared with the device path's host
// tail, which receives the iBWT output from the TPU instead).
int IbwtAndRle1(const std::vector<uint8_t>& last, uint32_t orig,
                std::vector<uint8_t>* plain) {
  // Inverse BWT (counting sort -> next-pointer walk).
  const size_t bn = last.size();
  std::vector<uint32_t> cnt(256, 0);
  for (uint8_t b : last) ++cnt[b];
  uint32_t tot = 0;
  uint32_t base[256];
  for (int i = 0; i < 256; ++i) {
    base[i] = tot;
    tot += cnt[i];
  }
  std::vector<uint32_t> tvec(bn);
  {
    uint32_t fill[256];
    std::memcpy(fill, base, sizeof(base));
    for (size_t i = 0; i < bn; ++i) tvec[fill[last[i]]++] = (uint32_t)i;
  }
  std::vector<uint8_t> bwt_out(bn);
  {
    uint32_t p = tvec[orig];
    for (size_t i = 0; i < bn; ++i) {
      bwt_out[i] = last[p];
      p = tvec[p];
    }
  }

  return Rle1Inverse(bwt_out.data(), bn, plain);
}

int DecodeBlockBody(BitReaderMSB* br, std::vector<uint8_t>* plain,
                    uint32_t* block_crc_out) {
  std::vector<uint8_t> last;
  uint32_t orig = 0;
  int st = DecodeBlockToLast(br, &last, &orig, block_crc_out);
  if (st != kStatusOk) return st;
  return IbwtAndRle1(last, orig, plain);
}

}  // namespace

namespace {

// Serial single-pass decode (the reference path, and the fallback when the
// parallel splitter hits a false-positive magic).
int Bzip2DecodeSerial(const uint8_t* in, size_t n, std::vector<uint8_t>* out) {
  size_t stream_start = 0;
  bool decoded_any = false;
  while (stream_start < n) {
    BitReaderMSB br(in + stream_start, n - stream_start);
    if (br.Read(8) != 'B' || br.Read(8) != 'Z' || br.Read(8) != 'h')
      return decoded_any ? kStatusOk : kStatusDataError;
    uint32_t lvl = br.Read(8);
    if (lvl < '1' || lvl > '9') return kStatusDataError;
    if (br.Overrun()) return kStatusUnexpectedEof;
    uint32_t combined = 0;
    for (;;) {
      uint64_t magic = ((uint64_t)br.Read(24) << 24) | br.Read(24);
      if (br.Overrun()) return kStatusUnexpectedEof;
      if (magic == kEosMagic) {
        uint32_t expect = br.Read(32);
        if (br.Overrun()) return kStatusUnexpectedEof;
        if (expect != combined) return kStatusDataError;
        break;
      }
      if (magic != kBlockMagic) return kStatusDataError;
      size_t before = out->size();
      uint32_t block_crc;
      int st = DecodeBlockBody(&br, out, &block_crc);
      if (st != kStatusOk) return st;
      uint32_t actual = Crc32Msb(out->data() + before, out->size() - before,
                                 0xFFFFFFFF) ^ 0xFFFFFFFF;
      if (actual != block_crc) return kStatusDataError;
      combined = ((combined << 1) | (combined >> 31)) ^ block_crc;
    }
    // Streams are byte-aligned; advance to the next one.
    uint64_t bits = br.BitsConsumed();
    stream_start += (size_t)((bits + 7) / 8);
    decoded_any = true;
  }
  return decoded_any ? kStatusOk : kStatusUnexpectedEof;
}

// Find candidate bit offsets of the 48-bit block magic (lbzip2-style
// splitter). A false positive (2^-48 per bit) is caught by the per-block
// decode/CRC and falls back to the serial path.
void FindBlockMagics(const uint8_t* in, size_t n,
                     std::vector<uint64_t>* bit_offs) {
  if (n < 10) return;
  uint64_t window = 0;
  const uint64_t mask = (1ull << 48) - 1;
  for (size_t i = 0; i < n; ++i) {
    uint64_t byte = in[i];
    for (int b = 7; b >= 0; --b) {
      window = ((window << 1) | ((byte >> b) & 1)) & mask;
      uint64_t bitpos = 8ull * i + (7 - b) + 1;
      if (bitpos >= 48 && window == kBlockMagic)
        bit_offs->push_back(bitpos - 48);
    }
  }
}

// Decode one block whose body starts right AFTER the 48-bit magic at
// bit_off. Reads via a byte-shifted view so BitReaderMSB can start there.
int DecodeBlockAt(const uint8_t* in, size_t n, uint64_t body_bit,
                  std::vector<uint8_t>* out, uint32_t* crc) {
  size_t byte0 = (size_t)(body_bit >> 3);
  int skip = (int)(body_bit & 7);
  BitReaderMSB br(in + byte0, n - byte0);
  if (skip) br.Read(skip);
  return DecodeBlockBody(&br, out, crc);
}

}  // namespace

int Bzip2ScanToLast(const uint8_t* in, size_t n, uint8_t* last_blob,
                    int64_t blob_cap, int64_t* offs, int64_t* lens,
                    uint32_t* origs, uint32_t* crcs, int32_t* nblocks) {
  const int32_t cap = *nblocks;
  *nblocks = 0;
  if (n < 10 || in[0] != 'B' || in[1] != 'Z' || in[2] != 'h' ||
      in[3] < '1' || in[3] > '9')
    return kStatusUnexpected;
  std::vector<uint64_t> magics;
  FindBlockMagics(in, n, &magics);
  if (magics.empty() || magics.front() != 32 ||
      (int32_t)magics.size() > cap)
    return kStatusUnexpected;  // fall back to the serial decoder
  struct Job {
    std::vector<uint8_t> last;
    uint32_t orig = 0, crc = 0;
    uint64_t end_bit = 0;  // absolute bit just past the block body
    int status = 0;
  };
  std::vector<Job> jobs(magics.size());
  std::atomic<size_t> next(0);
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= jobs.size()) return;
      uint64_t body_bit = magics[i] + 48;
      size_t byte0 = (size_t)(body_bit >> 3);
      int skip = (int)(body_bit & 7);
      BitReaderMSB br(in + byte0, n - byte0);
      if (skip) br.Read(skip);
      jobs[i].status =
          DecodeBlockToLast(&br, &jobs[i].last, &jobs[i].orig, &jobs[i].crc);
      jobs[i].end_bit = 8ull * byte0 + br.BitsConsumed();
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  unsigned nt = std::min<size_t>(hw < 1 ? 1 : hw, jobs.size());
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  for (size_t i = 0; i < jobs.size(); ++i)
    if (jobs[i].status != 0) return kStatusUnexpected;  // fall back
  // Single-stream shape check: blocks must be contiguous (a gap means a
  // multi-stream concatenation or a magic false positive — the serial
  // decoder handles those).
  for (size_t i = 0; i + 1 < jobs.size(); ++i)
    if (jobs[i].end_bit != magics[i + 1]) return kStatusUnexpected;
  // EOS trailer check (ADVICE r2 medium): like both host decoders, the
  // device path must verify the end magic and the combined stream CRC.
  // The per-block CRCs exported here are compared against the decoded
  // plaintext in Bzip2Rle1Inverse, so folding them reproduces the actual
  // combined CRC.
  {
    uint32_t combined = 0;
    for (auto& j : jobs)
      combined = ((combined << 1) | (combined >> 31)) ^ j.crc;
    uint64_t eos_bit = jobs.back().end_bit;
    size_t b0 = (size_t)(eos_bit >> 3);
    if (b0 >= n) return kStatusUnexpectedEof;
    BitReaderMSB br(in + b0, n - b0);
    if (eos_bit & 7) br.Read((int)(eos_bit & 7));
    uint64_t m_hi = br.Read(24), m_lo = br.Read(24);
    uint32_t expect = br.Read(32);
    if (br.Overrun()) return kStatusUnexpectedEof;
    if (((m_hi << 24) | m_lo) != kEosMagic) return kStatusDataError;
    if (expect != combined) return kStatusDataError;
  }
  int64_t pos = 0;
  for (size_t i = 0; i < jobs.size(); ++i) {
    if (pos + (int64_t)jobs[i].last.size() > blob_cap)
      return kStatusBufferTooSmall;
    std::memcpy(last_blob + pos, jobs[i].last.data(), jobs[i].last.size());
    offs[i] = pos;
    lens[i] = (int64_t)jobs[i].last.size();
    origs[i] = jobs[i].orig;
    crcs[i] = jobs[i].crc;
    pos += (int64_t)jobs[i].last.size();
  }
  *nblocks = (int32_t)jobs.size();
  return kStatusOk;
}

int Bzip2Rle1Inverse(const uint8_t* bwt_blob, const int64_t* offs,
                     const int64_t* lens, const uint32_t* crcs, int32_t nb,
                     uint8_t* out, size_t* out_len) {
  std::vector<std::vector<uint8_t>> plains(nb);
  std::atomic<int32_t> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= nb || status.load() != 0) return;
      int st = Rle1Inverse(bwt_blob + offs[i], (size_t)lens[i], &plains[i]);
      if (st == 0) {
        uint32_t actual = Crc32Msb(plains[i].data(), plains[i].size(),
                                   0xFFFFFFFF) ^ 0xFFFFFFFF;
        if (actual != crcs[i]) st = kStatusDataError;
      }
      if (st != 0) status.store(st);
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  unsigned nt = std::min<int32_t>((int32_t)(hw < 1 ? 1 : hw), nb);
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  if (status.load() != 0) return status.load();
  size_t total = 0;
  for (auto& p : plains) total += p.size();
  if (total > *out_len) {
    *out_len = total;
    return kStatusBufferTooSmall;
  }
  size_t pos = 0;
  for (auto& p : plains) {
    std::memcpy(out + pos, p.data(), p.size());
    pos += p.size();
  }
  *out_len = total;
  return kStatusOk;
}

int Bzip2Decode(const uint8_t* in, size_t n, std::vector<uint8_t>* out) {
  unsigned hw = std::thread::hardware_concurrency();
  // Parallel path: single stream, big enough to matter, multiple blocks.
  if (hw >= 2 && n > (1u << 20)) {
    do {
      if (n < 10 || in[0] != 'B' || in[1] != 'Z' || in[2] != 'h') break;
      std::vector<uint64_t> magics;
      FindBlockMagics(in, n, &magics);
      if (magics.size() < 2) break;
      // Require the first magic right after the 4-byte header and the EOS
      // magic findable at the end; multi-stream inputs fall back.
      if (magics.front() != 32) break;
      struct BJob {
        uint64_t body_bit;
        std::vector<uint8_t> bytes;
        uint32_t crc = 0;
        int status = 0;
      };
      std::vector<BJob> jobsv(magics.size());
      for (size_t i = 0; i < magics.size(); ++i)
        jobsv[i].body_bit = magics[i] + 48;
      std::atomic<size_t> next(0);
      std::atomic<int> bad(0);
      auto worker = [&]() {
        for (;;) {
          size_t i = next.fetch_add(1);
          if (i >= jobsv.size()) return;
          BJob& j = jobsv[i];
          j.status = DecodeBlockAt(in, n, j.body_bit, &j.bytes, &j.crc);
          if (j.status != 0) bad.store(1);
          else {
            uint32_t actual =
                Crc32Msb(j.bytes.data(), j.bytes.size(), 0xFFFFFFFF) ^
                0xFFFFFFFF;
            if (actual != j.crc) {
              j.status = kStatusDataError;
              bad.store(1);
            }
          }
        }
      };
      unsigned nt = std::min<size_t>(hw, jobsv.size());
      std::vector<std::thread> ts;
      for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
      for (auto& t : ts) t.join();
      if (bad.load()) break;  // false-positive magic or corrupt: fall back
      // Combined CRC + EOS check still validated serially from the jobs.
      uint32_t combined = 0;
      for (auto& j : jobsv)
        combined = ((combined << 1) | (combined >> 31)) ^ j.crc;
      // Verify the EOS trailer: locate it after the last block. The last
      // block's end is unknown without re-walking, so scan for the EOS
      // magic after the last block's START (it cannot appear inside a
      // valid final block's remaining bits by the same 2^-48 argument —
      // and a mismatch of the combined CRC falls back anyway).
      uint64_t eos_bit = 0;
      bool found = false;
      {
        uint64_t window = 0;
        const uint64_t mask = (1ull << 48) - 1;
        size_t start_byte = (size_t)(jobsv.back().body_bit >> 3);
        for (size_t i = start_byte; i < n && !found; ++i) {
          uint64_t byte = in[i];
          for (int b = 7; b >= 0; --b) {
            window = ((window << 1) | ((byte >> b) & 1)) & mask;
            uint64_t bitpos = 8ull * i + (7 - b) + 1;
            if (bitpos >= 48 && window == kEosMagic) {
              eos_bit = bitpos;
              found = true;
              break;
            }
          }
        }
      }
      if (!found) break;
      size_t byte0 = (size_t)(eos_bit >> 3);
      int skip = (int)(eos_bit & 7);
      BitReaderMSB br(in + byte0, n - byte0);
      if (skip) br.Read(skip);
      uint32_t expect = br.Read(32);
      if (br.Overrun() || expect != combined) break;
      for (auto& j : jobsv)
        out->insert(out->end(), j.bytes.begin(), j.bytes.end());
      return kStatusOk;
    } while (false);
    out->clear();
  }
  return Bzip2DecodeSerial(in, n, out);
}

int Bzip2ScanHeaders(const uint8_t* in, size_t n, int32_t cap,
                     int64_t* sym_bits, int64_t* slice_end_bits,
                     uint32_t* origs, uint32_t* crcs, int32_t* n_useds,
                     int32_t* nts, int32_t* nsels, uint8_t* mtf_init,
                     uint8_t* selectors, uint8_t* lens_out,
                     int32_t* nblocks) {
  *nblocks = 0;
  if (n < 10 || in[0] != 'B' || in[1] != 'Z' || in[2] != 'h' ||
      in[3] < '1' || in[3] > '9')
    return kStatusUnexpected;
  std::vector<uint64_t> magics;
  FindBlockMagics(in, n, &magics);
  if (magics.empty() || magics.front() != 32 || (int32_t)magics.size() > cap)
    return kStatusUnexpected;
  const int32_t nb = (int32_t)magics.size();
  for (int32_t b = 0; b < nb; ++b) {
    uint64_t body_bit = magics[b] + 48;
    size_t byte0 = (size_t)(body_bit >> 3);
    BitReaderMSB br(in + byte0, n - byte0);
    if (body_bit & 7) br.Read((int)(body_bit & 7));

    crcs[b] = br.Read(32);
    if (br.Read(1)) return kStatusUnexpected;  // randomized: deprecated
    origs[b] = br.Read(24);
    if (br.Overrun()) return kStatusUnexpectedEof;

    uint8_t* init = mtf_init + (size_t)b * 256;
    int n_used = 0;
    uint16_t used16 = (uint16_t)br.Read(16);
    for (int i = 0; i < 16; ++i) {
      if (!(used16 & (1 << (15 - i)))) continue;
      uint16_t m = (uint16_t)br.Read(16);
      for (int j = 0; j < 16; ++j)
        if (m & (1 << (15 - j))) init[n_used++] = (uint8_t)(16 * i + j);
    }
    if (br.Overrun()) return kStatusUnexpectedEof;
    if (n_used == 0) return kStatusUnexpected;
    n_useds[b] = n_used;
    const int alpha = n_used + 2;

    int n_tables = (int)br.Read(3);
    int n_sel = (int)br.Read(15);
    if (n_tables < 2 || n_tables > 6 || n_sel < 1 || n_sel > kBzSelCap)
      return kStatusUnexpected;
    nts[b] = n_tables;
    nsels[b] = n_sel;
    uint8_t* sel = selectors + (size_t)b * kBzSelCap;
    {
      uint8_t order[6];
      for (int i = 0; i < n_tables; ++i) order[i] = (uint8_t)i;
      for (int g = 0; g < n_sel; ++g) {
        int j = 0;
        while (br.Read(1) == 1) {
          ++j;
          if (j >= n_tables) return kStatusUnexpected;
          if (br.Overrun()) return kStatusUnexpectedEof;
        }
        uint8_t v = order[j];
        std::memmove(order + 1, order, j);
        order[0] = v;
        sel[g] = v;
      }
    }
    if (br.Overrun()) return kStatusUnexpectedEof;

    for (int t = 0; t < n_tables; ++t) {
      uint8_t* lr = lens_out + ((size_t)b * 6 + t) * 258;
      int cur = (int)br.Read(5);
      for (int s = 0; s < alpha; ++s) {
        for (;;) {
          if (cur < 1 || cur > kMaxCodeLen) return kStatusUnexpected;
          if (br.Read(1) == 0) break;
          if (br.Read(1) == 0) ++cur;
          else --cur;
          if (br.Overrun()) return kStatusUnexpectedEof;
        }
        if (cur > 17) return kStatusUnexpected;  // device table split
        lr[s] = (uint8_t)cur;
      }
      if (br.Overrun()) return kStatusUnexpectedEof;
    }
    sym_bits[b] = (int64_t)(8ull * byte0 + br.BitsConsumed());
    slice_end_bits[b] = (b + 1 < nb) ? (int64_t)magics[b + 1]
                                     : (int64_t)(8 * n);
  }
  *nblocks = nb;
  return kStatusOk;
}

}  // namespace tpz
