// C ABI for ctypes bindings (tpz/oracle/__init__.py).
//
// Conventions: every function returns a status int (0 ok; see
// tpz/errors.py for the code map) unless it's an infallible pure function.
// Output buffers are caller-allocated; *out_len carries capacity in and
// actual length out. Status 4 = buffer too small.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "bitio.h"
#include "bzip2.h"
#include "deflate.h"
#include "huffman.h"
#include "lzhuf.h"
#include "lzss.h"

namespace tpz {
uint32_t Crc32Reflected(const uint8_t*, size_t, uint32_t);
uint32_t Crc32Msb(const uint8_t*, size_t, uint32_t);
uint32_t Adler32(const uint8_t*, size_t, uint32_t);
}  // namespace tpz

using namespace tpz;

namespace {
constexpr int kOk = 0;
constexpr int kBufferTooSmall = 4;

int CopyOut(const std::vector<uint8_t>& v, uint8_t* out, size_t* out_len) {
  if (v.size() > *out_len) {
    *out_len = v.size();
    return kBufferTooSmall;
  }
  if (!v.empty()) std::memcpy(out, v.data(), v.size());
  *out_len = v.size();
  return kOk;
}

// 14 int32s, matching tpz/oracle/__init__.py params_array():
// [0] window      [1] min_match  [2] max_match  [3] max_chain
// [4] hash_bits   [5] block_size [6] lazy       [7] too_far_rule
// [8] too_far     [9] max_lazy   [10] n_extend  [11] screen_bytes
// [12] suffix_mode [13] restart
constexpr int kNumLzssParams = 14;

LzssParams ParamsFromArray(const int32_t* p) {
  LzssParams lp;
  lp.window = p[0];
  lp.min_match = p[1];
  lp.max_match = p[2];
  lp.max_chain = p[3];
  lp.hash_bits = p[4];
  lp.block_size = p[5];
  lp.lazy = p[6] != 0;
  lp.too_far_rule = p[7] != 0;
  lp.too_far = p[8];
  lp.max_lazy = p[9];
  lp.n_extend = p[10];
  lp.screen_bytes = p[11];
  lp.suffix_mode = p[12];
  lp.restart = p[13];
  return lp;
}
}  // namespace

extern "C" {

// --------------------------------------------------------------- checksums
uint32_t tpz_crc32_reflected(const uint8_t* p, size_t n, uint32_t init_state) {
  return Crc32Reflected(p, n, init_state);
}
uint32_t tpz_crc32_msb(const uint8_t* p, size_t n, uint32_t init_state) {
  return Crc32Msb(p, n, init_state);
}
uint32_t tpz_adler32(const uint8_t* p, size_t n, uint32_t state) {
  return Adler32(p, n, state);
}

// ----------------------------------------------------------------- huffman
int tpz_huff_lengths(const uint32_t* freqs, int32_t nsyms, int32_t limit,
                     uint8_t* lengths) {
  return PackageMergeLengths(freqs, nsyms, limit, lengths) ? 0 : 1;
}
void tpz_huff_canonical(const uint8_t* lengths, int32_t nsyms,
                        uint32_t* codes) {
  CanonicalCodes(lengths, nsyms, codes);
}

// -------------------------------------------------------------------- lzss
// tokens_out layout: 4 x int32 per token [pos, len, lit, dist].
int tpz_lzss_tokenize(const uint8_t* in, size_t n, const int32_t* params14,
                      int32_t* tokens_out, size_t* ntokens /* cap in/out */) {
  std::vector<Token> toks;
  LzssTokenize(in, n, ParamsFromArray(params14), &toks);
  if (toks.size() > *ntokens) {
    *ntokens = toks.size();
    return kBufferTooSmall;
  }
  for (size_t i = 0; i < toks.size(); ++i) {
    tokens_out[4 * i + 0] = (int32_t)toks[i].pos;
    tokens_out[4 * i + 1] = toks[i].len;
    tokens_out[4 * i + 2] = toks[i].lit;
    tokens_out[4 * i + 3] = (int32_t)toks[i].dist;
  }
  *ntokens = toks.size();
  return kOk;
}

// ----------------------------------------------------------------- deflate
int tpz_deflate_encode(const uint8_t* in, size_t n, const int32_t* params14,
                       uint8_t* out, size_t* out_len) {
  DeflateParams dp;
  dp.lzss = ParamsFromArray(params14);
  BitWriterLSB bw;
  DeflateEncode(in, n, dp, &bw);
  return CopyOut(bw.bytes(), out, out_len);
}

// Encode exactly one DEFLATE block from pre-made tokens (device parity
// testing): block_data points at the block's first input byte.
int tpz_deflate_encode_block(const uint8_t* block_data, size_t block_len,
                             const int32_t* tokens, size_t ntokens,
                             int32_t bfinal, uint8_t* out, size_t* out_len) {
  std::vector<Token> toks(ntokens);
  for (size_t i = 0; i < ntokens; ++i) {
    toks[i].pos = (uint32_t)tokens[4 * i + 0];
    toks[i].len = (uint16_t)tokens[4 * i + 1];
    toks[i].lit = (uint16_t)tokens[4 * i + 2];
    toks[i].dist = (uint32_t)tokens[4 * i + 3];
  }
  BitWriterLSB bw;
  DeflateEncodeBlock(block_data, block_len, toks.data(), ntokens, bfinal != 0,
                     &bw);
  bw.AlignByte();
  return CopyOut(bw.bytes(), out, out_len);
}

// Action::Flush segment: all blocks BFINAL=0 + sync-flush empty stored
// block; concatenable into one stream (see DeflateEncode final_stream).
int tpz_deflate_encode_flush(const uint8_t* in, size_t n,
                             const int32_t* params14, uint8_t* out,
                             size_t* out_len) {
  DeflateParams dp;
  dp.lzss = ParamsFromArray(params14);
  BitWriterLSB bw;
  DeflateEncode(in, n, dp, &bw, /*final_stream=*/false);
  return CopyOut(bw.bytes(), out, out_len);
}

int tpz_inflate(const uint8_t* in, size_t n, uint8_t* out, size_t* out_len,
                size_t* consumed) {
  std::vector<uint8_t> v;
  int st = Inflate(in, n, &v, consumed);
  if (st != 0) return st;
  return CopyOut(v, out, out_len);
}

// Resumable inflate for the streaming decode facade (tpz.api.DecodeStream):
// O(1) state between feeds, O(total) across many small writes.
void* tpz_inflate_stream_new(void) { return new InflateStream(); }
void tpz_inflate_stream_free(void* h) {
  delete static_cast<InflateStream*>(h);
}
// Returns status (0 ok, 1 data error); *finished=1 once the final block is
// complete; *consumed = input bytes the finished stream spans; *pending =
// decoded bytes available to take.
int tpz_inflate_stream_feed(void* h, const uint8_t* data, size_t len,
                            int32_t* finished, int64_t* consumed,
                            int64_t* pending) {
  auto* s = static_cast<InflateStream*>(h);
  int st = s->Feed(data, len);
  *finished = s->finished() ? 1 : 0;
  *consumed = (int64_t)s->consumed_bytes();
  *pending = (int64_t)s->pending().size();
  return st;
}
// Copies up to `cap` pending decoded bytes into `out` and removes them.
int64_t tpz_inflate_stream_take(void* h, uint8_t* out, int64_t cap) {
  auto* s = static_cast<InflateStream*>(h);
  auto& p = s->pending();
  int64_t take = std::min<int64_t>(cap, (int64_t)p.size());
  if (take > 0) {
    std::memcpy(out, p.data(), (size_t)take);
    p.erase(p.begin(), p.begin() + take);
  }
  return take;
}

// Resumable lzhuf decode for the streaming facade (mirrors the inflate
// stream ABI above): O(total) across many small writes.
void* tpz_lzhuf_stream_new(int32_t dict_bits, uint64_t orig_size) {
  return new LzhufStream(LzhufMethodFor(dict_bits), orig_size);
}
void tpz_lzhuf_stream_free(void* h) { delete static_cast<LzhufStream*>(h); }
int tpz_lzhuf_stream_feed(void* h, const uint8_t* data, size_t len,
                          int32_t* finished, int64_t* pending) {
  auto* s = static_cast<LzhufStream*>(h);
  int st = s->Feed(data, len);
  *finished = s->finished() ? 1 : 0;
  *pending = (int64_t)(s->out().size() - s->taken);
  return st;
}
// Copies up to `cap` pending decoded bytes into `out`. The history stays
// resident (it is the LZSS window); only the taken cursor advances.
int64_t tpz_lzhuf_stream_take(void* h, uint8_t* out, int64_t cap) {
  auto* s = static_cast<LzhufStream*>(h);
  int64_t avail = (int64_t)(s->out().size() - s->taken);
  int64_t take = std::min<int64_t>(cap, avail);
  if (take > 0) {
    std::memcpy(out, s->out().data() + s->taken, (size_t)take);
    s->taken += (size_t)take;
  }
  return take;
}

int tpz_inflate_scan_headers(const uint8_t* in, size_t n,
                             const int64_t* end_bits, int32_t nb,
                             int32_t* btype, int64_t* body_bit,
                             int32_t* c0_pos, int32_t* c0_len,
                             int32_t* c1_pos, int32_t* c1_len,
                             int32_t* lit_bits, int32_t* dist_bits,
                             uint32_t* lit_tab, uint32_t* dist_tab) {
  return InflateScanHeaders(in, n, end_bits, nb, btype, body_bit, c0_pos,
                            c0_len, c1_pos, c1_len, lit_bits, dist_bits,
                            lit_tab, dist_tab);
}

// Segment scan: like tpz_inflate_scan_headers but with explicit per-entry
// header/first-symbol bits (mid-block segments from tpz_inflate_index).
int tpz_inflate_scan_segments(const uint8_t* in, size_t n,
                              const int64_t* hdr_bits,
                              const int64_t* seg_bits,
                              const int64_t* end_bits, int32_t nb,
                              int32_t* btype, int64_t* body_bit,
                              int32_t* c0_pos, int32_t* c0_len,
                              int32_t* c1_pos, int32_t* c1_len,
                              int32_t* lit_bits, int32_t* dist_bits,
                              uint32_t* lit_tab, uint32_t* dist_tab) {
  return InflateScanHeaders(in, n, end_bits, nb, btype, body_bit, c0_pos,
                            c0_len, c1_pos, c1_len, lit_bits, dist_bits,
                            lit_tab, dist_tab, hdr_bits, seg_bits);
}

int tpz_inflate_index(const uint8_t* in, size_t n, int64_t seg_out,
                      int64_t max_segs, int64_t max_span_bytes,
                      int64_t* hdr_bits, int64_t* seg_bits,
                      int64_t* end_bits, int64_t* out_lens,
                      int32_t* carry_len, int32_t* carry_dist,
                      int64_t* nseg_out, size_t* consumed_bytes) {
  return InflateIndex(in, n, seg_out, max_segs, max_span_bytes, hdr_bits,
                      seg_bits, end_bits, out_lens, carry_len, carry_dist,
                      nseg_out, consumed_bytes);
}

// ------------------------------------------------------------------- bzip2
int tpz_bzip2_encode(const uint8_t* in, size_t n, int32_t level, uint8_t* out,
                     size_t* out_len) {
  std::vector<uint8_t> v;
  Bzip2Encode(in, n, level, &v);
  return CopyOut(v, out, out_len);
}

int tpz_bzip2_decode(const uint8_t* in, size_t n, uint8_t* out,
                     size_t* out_len) {
  std::vector<uint8_t> v;
  int st = Bzip2Decode(in, n, &v);
  if (st != 0) return st;
  return CopyOut(v, out, out_len);
}

// ------------------------------------------------------------------- lzhuf
int tpz_lzhuf_encode(const uint8_t* in, size_t n, int32_t dict_bits,
                     int32_t max_chain, uint8_t* out, size_t* out_len) {
  BitWriterMSB bw;
  LzhufEncodeBytes(in, n, LzhufMethodFor(dict_bits), max_chain, &bw);
  return CopyOut(bw.bytes(), out, out_len);
}

int tpz_lzhuf_encode_tokens(const int32_t* tokens, size_t ntokens,
                            int32_t dict_bits, uint8_t* out,
                            size_t* out_len) {
  std::vector<Token> toks(ntokens);
  for (size_t i = 0; i < ntokens; ++i) {
    toks[i].pos = (uint32_t)tokens[4 * i + 0];
    toks[i].len = (uint16_t)tokens[4 * i + 1];
    toks[i].lit = (uint16_t)tokens[4 * i + 2];
    toks[i].dist = (uint32_t)tokens[4 * i + 3];
  }
  BitWriterMSB bw;
  LzhufEncode(toks.data(), ntokens, LzhufMethodFor(dict_bits), &bw);
  bw.AlignByte();
  return CopyOut(bw.bytes(), out, out_len);
}

int tpz_lzhuf_decode(const uint8_t* in, size_t n, int32_t dict_bits,
                     size_t orig_size, uint8_t* out, size_t* out_len) {
  std::vector<uint8_t> v;
  int st = LzhufDecode(in, n, LzhufMethodFor(dict_bits), orig_size, &v);
  if (st != 0) return st;
  return CopyOut(v, out, out_len);
}

int tpz_lzhuf_index(const uint8_t* in, size_t n, int32_t dict_bits,
                    size_t orig_size, int64_t seg_out, int64_t max_segs,
                    int64_t max_blocks, int64_t* seg_bits,
                    int64_t* end_bits, int64_t* out_lens,
                    int32_t* carry_len, int32_t* carry_dist,
                    int32_t* block_ids, uint8_t* c_lens, uint8_t* p_lens,
                    int32_t* c_consts, int32_t* p_consts,
                    int64_t* nseg_out, int64_t* nblk_out) {
  return LzhufIndex(in, n, LzhufMethodFor(dict_bits), orig_size, seg_out,
                    max_segs, max_blocks, seg_bits, end_bits, out_lens,
                    carry_len, carry_dist, block_ids, c_lens, p_lens,
                    c_consts, p_consts, nseg_out, nblk_out);
}

int tpz_deflate_plan(const uint32_t* lit_freq, const uint32_t* dist_freq,
                     const int64_t* block_lens, int32_t nb, int32_t* btype,
                     int64_t* body_bit_offset, int64_t* chunk1_bit_offset,
                     int64_t* total_bits, uint8_t* lit_len,
                     uint16_t* lit_code, uint8_t* dist_len,
                     uint16_t* dist_code, uint8_t* header_stream,
                     size_t header_cap) {
  return DeflatePlan(lit_freq, dist_freq, block_lens, nb, btype,
                     body_bit_offset, chunk1_bit_offset, total_bits, lit_len,
                     lit_code, dist_len, dist_code, header_stream, header_cap);
}

}  // extern "C"

extern "C" int tpz_lzhuf_plan(const uint32_t* c_freq, const uint32_t* p_freq,
                              const uint32_t* token_counts, int32_t nb,
                              int32_t dict_bits, int64_t* body_bit_offset,
                              int64_t* total_bits, uint8_t* c_len,
                              uint16_t* c_code, uint8_t* p_len,
                              uint16_t* p_code, uint8_t* header_stream,
                              size_t header_cap) {
  return tpz::LzhufPlan(c_freq, p_freq, token_counts, nb, dict_bits,
                        body_bit_offset, total_bits, c_len, c_code, p_len,
                        p_code, header_stream, header_cap);
}

extern "C" int tpz_bzip2_rle1(const uint8_t* in, size_t n, int32_t level,
                              uint8_t* rle_out, size_t* rle_len,
                              int64_t* block_off, int64_t* block_len,
                              uint32_t* block_crc, int32_t* nblocks) {
  return tpz::Bzip2Rle1Blocks(in, n, level, rle_out, rle_len, block_off,
                              block_len, block_crc, nblocks);
}

extern "C" int tpz_bzip2_assemble(const uint8_t* bwt_last,
                                  const int64_t* block_off,
                                  const int64_t* block_len,
                                  const uint32_t* block_crc,
                                  const uint32_t* orig_ptrs, int32_t nblocks,
                                  int32_t level, uint8_t* out,
                                  size_t* out_len) {
  std::vector<uint8_t> v;
  int st = tpz::Bzip2Assemble(bwt_last, block_off, block_len, block_crc,
                              orig_ptrs, nblocks, level, &v);
  if (st != 0) return st;
  return CopyOut(v, out, out_len);
}

extern "C" int tpz_bzip2_assemble_mtf(const uint16_t* mtfv_blob,
                                      const int64_t* sym_off,
                                      const int32_t* sym_len,
                                      const uint8_t* used,
                                      const uint32_t* block_crc,
                                      const uint32_t* orig_ptrs,
                                      int32_t nblocks, int32_t level,
                                      uint8_t* out, size_t* out_len) {
  std::vector<uint8_t> v;
  int st = tpz::Bzip2AssembleMtf(mtfv_blob, sym_off, sym_len, used,
                                 block_crc, orig_ptrs, nblocks, level, &v);
  if (st != 0) return st;
  return CopyOut(v, out, out_len);
}

extern "C" uint32_t tpz_bwt_ref(const uint8_t* in, size_t n,
                                uint8_t* last_out) {
  return tpz::BwtEncodeRef(in, n, last_out);
}

// Prefix-doubling rotation sort, exported so tests can differentially
// check the SA-IS fast path inside BwtEncode against an independent
// algorithm (tests/test_oracle_scans.py, test_bzip2.py).
extern "C" uint32_t tpz_bwt_ref_doubling(const uint8_t* in, size_t n,
                                         uint8_t* last_out) {
  std::vector<uint8_t> s(in, in + n), last;
  uint32_t orig = tpz::BwtEncodeDoubling(s, &last);
  std::copy(last.begin(), last.end(), last_out);
  return orig;
}

// Device bzip2 decode, stage 1 (host): decode every block of a single
// bzip2 stream to its pre-iBWT last column. Returns 3 ("Unexpected") for
// shapes the indexed path doesn't handle (multi-stream, randomized, magic
// false positives) — the caller falls back to the serial decoder.
extern "C" int tpz_bzip2_scan_to_last(const uint8_t* in, size_t n,
                                      uint8_t* last_blob, int64_t blob_cap,
                                      int64_t* offs, int64_t* lens,
                                      uint32_t* origs, uint32_t* crcs,
                                      int32_t* nblocks /* cap in/out */) {
  return tpz::Bzip2ScanToLast(in, n, last_blob, blob_cap, offs, lens, origs,
                              crcs, nblocks);
}

// All-device bzip2 decode (round 3): header-only scan feeding the device
// symbol walk (tables/selectors/MTF init per block; no symbol decode).
extern "C" int tpz_bzip2_scan_headers(const uint8_t* in, size_t n,
                                      int32_t cap, int64_t* sym_bits,
                                      int64_t* slice_end_bits,
                                      uint32_t* origs, uint32_t* crcs,
                                      int32_t* n_useds, int32_t* nts,
                                      int32_t* nsels, uint8_t* mtf_init,
                                      uint8_t* selectors, uint8_t* lens_out,
                                      int32_t* nblocks) {
  return tpz::Bzip2ScanHeaders(in, n, cap, sym_bits, slice_end_bits, origs,
                               crcs, n_useds, nts, nsels, mtf_init,
                               selectors, lens_out, nblocks);
}

// Device bzip2 decode, stage 3 (host): RLE1^-1 + per-block CRC check over
// the device-produced iBWT output.
extern "C" int tpz_bzip2_rle1_inverse(const uint8_t* bwt_blob,
                                      const int64_t* offs,
                                      const int64_t* lens,
                                      const uint32_t* crcs, int32_t nb,
                                      uint8_t* out, size_t* out_len) {
  return tpz::Bzip2Rle1Inverse(bwt_blob, offs, lens, crcs, nb, out, out_len);
}

// ------------------------------------------------------ threaded batch APIs
// The reference crate is strictly single-threaded; the native runtime here
// may use host threads (SURVEY.md §2.2: independent streams are the
// parallel unit). Flat-blob + offsets interface for ctypes.
#include <atomic>
#include <thread>

extern "C" int tpz_inflate_many(const uint8_t* blob, const int64_t* offs,
                                const int64_t* lens, int32_t n,
                                uint8_t* out_blob, const int64_t* out_offs,
                                int64_t* out_lens /* cap in, actual out */,
                                int32_t n_threads) {
  std::atomic<int32_t> next(0);
  std::atomic<int> status(0);        // hard decode errors: abort all workers
  std::atomic<bool> too_small(false);  // soft: keep sizing remaining streams
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n || status.load() != 0) return;
      std::vector<uint8_t> v;
      size_t consumed = 0;
      int st = Inflate(blob + offs[i], (size_t)lens[i], &v, &consumed);
      if (st != 0) {
        status.store(st);
        return;
      }
      if ((int64_t)v.size() > out_lens[i]) {
        // Report the required size but keep going so ONE retry pass can
        // right-size every stream (not just those before the first failure).
        out_lens[i] = (int64_t)v.size();
        too_small.store(true);
        continue;
      }
      if (!v.empty()) std::memcpy(out_blob + out_offs[i], v.data(), v.size());
      out_lens[i] = (int64_t)v.size();
    }
  };
  int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  int st = status.load();
  if (st == 0 && too_small.load()) return 4;
  return st;
}

// ----------------------------------------------------- standalone LZSS codec
// Tagged-byte serialization used by tpz/codecs/lzss.py: per 8 tokens one
// flag byte (bit i set => token i is a Reference), literals as 1 raw byte,
// references as len-min_match (1 byte) + dist (2 bytes LE).
extern "C" int tpz_lzss_pack(const int32_t* tokens, size_t ntokens,
                             int32_t min_match, uint8_t* out,
                             size_t* out_len) {
  std::vector<uint8_t> v;
  v.reserve(ntokens * 2);
  size_t flag_at = 0;
  for (size_t i = 0; i < ntokens; ++i) {
    if (i % 8 == 0) {
      flag_at = v.size();
      v.push_back(0);
    }
    int32_t len = tokens[4 * i + 1];
    if (len) {
      v[flag_at] |= (uint8_t)(1u << (i % 8));
      uint32_t dist = (uint32_t)tokens[4 * i + 3];
      v.push_back((uint8_t)(len - min_match));
      v.push_back((uint8_t)(dist & 0xFF));
      v.push_back((uint8_t)(dist >> 8));
    } else {
      v.push_back((uint8_t)tokens[4 * i + 2]);
    }
  }
  return CopyOut(v, out, out_len);
}

extern "C" int tpz_lzss_unpack(const uint8_t* in, size_t in_len,
                               int64_t orig_size, int32_t min_match,
                               uint8_t* out, size_t* out_len) {
  if ((int64_t)*out_len < orig_size) {
    *out_len = (size_t)orig_size;
    return 4;
  }
  size_t i = 0, n = (size_t)orig_size, produced = 0;
  while (produced < n) {
    if (i >= in_len) return 2;  // UnexpectedEof
    uint8_t flags = in[i++];
    for (int b = 0; b < 8 && produced < n; ++b) {
      if (flags & (1u << b)) {
        if (i + 3 > in_len) return 2;
        size_t len = (size_t)in[i] + (size_t)min_match;
        uint32_t dist = (uint32_t)in[i + 1] | ((uint32_t)in[i + 2] << 8);
        i += 3;
        if (dist == 0 || (size_t)dist > produced) return 1;  // DataError
        if (produced + len > n) return 1;  // ref crosses declared size
        for (size_t k = 0; k < len; ++k, ++produced)
          out[produced] = out[produced - dist];
      } else {
        if (i >= in_len) return 2;
        out[produced++] = in[i++];
      }
    }
  }
  *out_len = produced;
  return 0;
}

extern "C" int tpz_deflate_encode_many(const uint8_t* blob,
                                       const int64_t* offs,
                                       const int64_t* lens, int32_t n,
                                       const int32_t* params14,
                                       uint8_t* out_blob,
                                       const int64_t* out_offs,
                                       int64_t* out_lens, int32_t n_threads) {
  LzssParams lp = ParamsFromArray(params14);
  std::atomic<int32_t> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n || status.load() != 0) return;
      DeflateParams dp;
      dp.lzss = lp;
      BitWriterLSB bw;
      DeflateEncode(blob + offs[i], (size_t)lens[i], dp, &bw);
      if ((int64_t)bw.bytes().size() > out_lens[i]) {
        out_lens[i] = (int64_t)bw.bytes().size();
        status.store(4);
        return;
      }
      if (!bw.bytes().empty())
        std::memcpy(out_blob + out_offs[i], bw.bytes().data(),
                    bw.bytes().size());
      out_lens[i] = (int64_t)bw.bytes().size();
    }
  };
  int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return status.load();
}
