#include "lzhuf.h"

#include <algorithm>
#include <atomic>
#include <cstring>
#include <thread>

#include "generated_constants.h"
#include "huffman.h"

namespace tpz {

namespace {

constexpr int kStatusOk = 0;
constexpr int kStatusDataError = 1;
constexpr int kStatusUnexpectedEof = 2;

constexpr int kNT = 19;      // pre-table alphabet
constexpr int kNC = 510;     // 256 literals + lengths 3..256
constexpr int kTBits = 5;    // bits for T-table count
constexpr int kCBits = 9;    // bits for C-table count
constexpr int kMaxLen = 16;  // code length limit for C/P tables
constexpr int kTLen = 16;    // length limit for the T table itself
// One lzhuf block per LZSS parse block (spec v1): block grouping follows
// token positions, so the device pipeline's per-block arrays map 1:1 onto
// lzhuf blocks (tpz/kernels/lzhuf_pipeline.py).
constexpr uint32_t kParseBlock = 32768;

inline int BitLength(uint32_t v) {
  int c = 0;
  while (v) {
    ++c;
    v >>= 1;
  }
  return c;
}

// ---- table writers (ar002-compatible layout) ----

// MSB-first bit writer that ORs into a caller-provided buffer at absolute
// bit offsets (for the device-pipeline planner: device body bits are ORed
// into the same bit-space afterwards).
class AbsBitWriterMSB {
 public:
  AbsBitWriterMSB(uint8_t* buf, size_t cap_bytes, uint64_t pos)
      : buf_(buf), cap_(cap_bytes), pos_(pos) {}
  void Write(uint32_t v, int n) {
    for (int b = n - 1; b >= 0; --b) {
      if ((v >> b) & 1) {
        size_t byte = (size_t)(pos_ >> 3);
        if (byte < cap_) buf_[byte] |= (uint8_t)(0x80u >> (pos_ & 7));
      }
      ++pos_;
    }
  }
  void WriteHuff(uint32_t code, int nbits) { Write(code, nbits); }
  uint64_t pos() const { return pos_; }
  void set_pos(uint64_t p) { pos_ = p; }

 private:
  uint8_t* buf_;
  size_t cap_;
  uint64_t pos_;
};

// T-table: lengths of the 19-symbol C-length alphabet.
template <typename Writer>
void WriteTLensT(const uint8_t* lens, Writer* bw) {
  int n = kNT;
  while (n > 0 && lens[n - 1] == 0) --n;
  // Count==0 form requires a constant C-length symbol; only usable when no
  // symbol has a code (never: C-table always encodes something), so use it
  // only when exactly zero lengths — instead emit count>=1 always unless
  // the table is fully empty.
  if (n == 0) {
    bw->Write(0, kTBits);
    bw->Write(0, kTBits);
    return;
  }
  bw->Write(n, kTBits);
  int i = 0;
  while (i < n) {
    int len = lens[i];
    if (len <= 6) {
      bw->Write(len, 3);
    } else {
      bw->Write(7, 3);
      for (int k = 7; k < len; ++k) bw->Write(1, 1);
      bw->Write(0, 1);
    }
    ++i;
    if (i == 3) {  // 2-bit zero-run skip after the third entry
      int skip = 0;
      while (i + skip < n && skip < 3 && lens[i + skip] == 0) ++skip;
      bw->Write(skip, 2);
      i += skip;
    }
  }
}

// C-table lengths via the T-Huffman code.
template <typename Writer>
void WriteCLensT(const uint8_t* clen, const uint8_t* tlen,
                 const uint32_t* tcode, Writer* bw) {
  int n = kNC;
  while (n > 0 && clen[n - 1] == 0) --n;
  if (n == 0) {
    bw->Write(0, kCBits);
    bw->Write(0, kCBits);
    return;
  }
  bw->Write(n, kCBits);
  int i = 0;
  while (i < n) {
    if (clen[i] == 0) {
      int run = 0;
      while (i + run < n && clen[i + run] == 0) ++run;
      while (run > 0) {
        if (run <= 2) {
          for (int k = 0; k < run; ++k) bw->WriteHuff(tcode[0], tlen[0]);
          run = 0;
        } else if (run <= 18) {
          bw->WriteHuff(tcode[1], tlen[1]);
          bw->Write(run - 3, 4);
          run = 0;
        } else if (run == 19) {
          // 19 = one zero + run of 18
          bw->WriteHuff(tcode[0], tlen[0]);
          bw->WriteHuff(tcode[1], tlen[1]);
          bw->Write(15, 4);
          run = 0;
        } else {
          int take = std::min(run, 20 + 511);
          bw->WriteHuff(tcode[2], tlen[2]);
          bw->Write(take - 20, 9);
          run -= take;
        }
      }
      i += 0;
      while (i < n && clen[i] == 0) ++i;  // advance past the zeros handled
    } else {
      int s = clen[i] + 2;
      bw->WriteHuff(tcode[s], tlen[s]);
      ++i;
    }
  }
}

// P-table: 3-bit lengths with unary extension, count field of `cbits` bits.
template <typename Writer>
void WritePLensT(const uint8_t* lens, int np, int cbits, Writer* bw) {
  int n = np;
  while (n > 0 && lens[n - 1] == 0) --n;
  if (n == 0) {
    bw->Write(0, cbits);
    bw->Write(0, cbits);
    return;
  }
  bw->Write(n, cbits);
  for (int i = 0; i < n; ++i) {
    int len = lens[i];
    if (len <= 6) {
      bw->Write(len, 3);
    } else {
      bw->Write(7, 3);
      for (int k = 7; k < len; ++k) bw->Write(1, 1);
      bw->Write(0, 1);
    }
  }
}

// ---- table readers ----

int ReadTLens(BitReaderMSB* br, uint8_t* lens, uint16_t* const_sym) {
  std::memset(lens, 0, kNT);
  *const_sym = 0xffff;
  int n = (int)br->Read(kTBits);
  if (br->Overrun()) return kStatusUnexpectedEof;
  if (n == 0) {
    *const_sym = (uint16_t)br->Read(kTBits);
    return br->Overrun() ? kStatusUnexpectedEof : kStatusOk;
  }
  if (n > kNT) return kStatusDataError;
  int i = 0;
  while (i < n) {
    int len = (int)br->Read(3);
    if (len == 7) {
      while (br->Read(1) == 1) {
        ++len;
        if (len > 32) return kStatusDataError;
      }
    }
    if (br->Overrun()) return kStatusUnexpectedEof;
    lens[i++] = (uint8_t)len;
    if (i == 3) {
      int skip = (int)br->Read(2);
      if (i + skip > n) return kStatusDataError;
      i += skip;
    }
  }
  return kStatusOk;
}

int ReadCLens(BitReaderMSB* br, const HuffDecodeTable& t, uint16_t t_const,
              uint8_t* lens, uint16_t* const_sym) {
  std::memset(lens, 0, kNC);
  *const_sym = 0xffff;
  int n = (int)br->Read(kCBits);
  if (br->Overrun()) return kStatusUnexpectedEof;
  if (n == 0) {
    *const_sym = (uint16_t)br->Read(kCBits);
    return br->Overrun() ? kStatusUnexpectedEof : kStatusOk;
  }
  if (n > kNC) return kStatusDataError;
  int i = 0;
  while (i < n) {
    int sym;
    if (t_const != 0xffff) {
      sym = t_const;
    } else {
      uint32_t peek = br->Peek(t.bits);
      uint32_t e = t.entries[peek];
      int len = (int)(e & 0x1f);
      if (len == 0) return kStatusDataError;
      br->Consume(len);
      sym = (int)(e >> 5);
    }
    if (br->Overrun()) return kStatusUnexpectedEof;
    if (sym == 0) {
      lens[i++] = 0;
    } else if (sym == 1) {
      int run = 3 + (int)br->Read(4);
      if (i + run > n) return kStatusDataError;
      i += run;
    } else if (sym == 2) {
      int run = 20 + (int)br->Read(9);
      if (i + run > n) return kStatusDataError;
      i += run;
    } else {
      lens[i++] = (uint8_t)(sym - 2);
    }
  }
  return kStatusOk;
}

int ReadPLens(BitReaderMSB* br, int np, int cbits, uint8_t* lens,
              uint16_t* const_sym) {
  std::memset(lens, 0, np);
  *const_sym = 0xffff;
  int n = (int)br->Read(cbits);
  if (br->Overrun()) return kStatusUnexpectedEof;
  if (n == 0) {
    *const_sym = (uint16_t)br->Read(cbits);
    return br->Overrun() ? kStatusUnexpectedEof : kStatusOk;
  }
  if (n > np) return kStatusDataError;
  for (int i = 0; i < n; ++i) {
    int len = (int)br->Read(3);
    if (len == 7) {
      while (br->Read(1) == 1) {
        ++len;
        if (len > 32) return kStatusDataError;
      }
    }
    if (br->Overrun()) return kStatusUnexpectedEof;
    lens[i] = (uint8_t)len;
  }
  return kStatusOk;
}

}  // namespace

LzhufMethod LzhufMethodFor(int dict_bits) {
  LzhufMethod m;
  m.dict_bits = dict_bits;
  m.np = dict_bits == 12 ? 14 : dict_bits + 1;  // lh4 shares lh5's np
  m.pbit = m.np <= 14 ? 4 : 5;
  return m;
}

namespace {

struct LzhufTables {
  std::vector<uint8_t> clen, plen;
  std::vector<uint32_t> ccode, pcode;
  uint8_t tlen[kNT];
  uint32_t tcode[kNT];
  int cused = 0, clast = 0, pused = 0, plast = 0, tused = 0, tlast = 0;
};

// Everything downstream of the (C, P) histograms; shared by the streaming
// encoder and the device-pipeline planner so they cannot diverge.
LzhufTables BuildTables(const uint32_t* cfreq, const uint32_t* pfreq,
                        const LzhufMethod& m) {
  LzhufTables T;
  T.clen.assign(kNC, 0);
  T.plen.assign(m.np, 0);
  T.ccode.assign(kNC, 0);
  T.pcode.assign(m.np, 0);
  std::memset(T.tlen, 0, sizeof(T.tlen));
  std::memset(T.tcode, 0, sizeof(T.tcode));
  for (int s = 0; s < kNC; ++s)
    if (cfreq[s]) {
      ++T.cused;
      T.clast = s;
    }
  for (int s = 0; s < m.np; ++s)
    if (pfreq[s]) {
      ++T.pused;
      T.plast = s;
    }
  if (T.cused > 1) {
    PackageMergeLengths(cfreq, kNC, kMaxLen, T.clen.data());
    CanonicalCodes(T.clen.data(), kNC, T.ccode.data());
    // T-table: histogram of the C-length RLE emission.
    uint32_t tfreq[kNT] = {0};
    int n = kNC;
    while (n > 0 && T.clen[n - 1] == 0) --n;
    int i = 0;
    while (i < n) {
      if (T.clen[i] == 0) {
        int run = 0;
        while (i + run < n && T.clen[i + run] == 0) ++run;
        int r = run;
        while (r > 0) {
          if (r <= 2) {
            tfreq[0] += r;
            r = 0;
          } else if (r <= 18) {
            ++tfreq[1];
            r = 0;
          } else if (r == 19) {
            ++tfreq[0];
            ++tfreq[1];
            r = 0;
          } else {
            int take = std::min(r, 20 + 511);
            ++tfreq[2];
            r -= take;
          }
        }
        i += run;
      } else {
        ++tfreq[T.clen[i] + 2];
        ++i;
      }
    }
    for (int sTT = 0; sTT < kNT; ++sTT)
      if (tfreq[sTT]) {
        ++T.tused;
        T.tlast = sTT;
      }
    if (T.tused > 1) {
      PackageMergeLengths(tfreq, kNT, kTLen, T.tlen);
      CanonicalCodes(T.tlen, kNT, T.tcode);
    }
  }
  if (T.pused > 1) {
    PackageMergeLengths(pfreq, m.np, kMaxLen, T.plen.data());
    CanonicalCodes(T.plen.data(), m.np, T.pcode.data());
  }
  return T;
}

template <typename Writer>
void EmitHeader(const LzhufTables& T, uint32_t cnt, const LzhufMethod& m,
                Writer* bw) {
  bw->Write(cnt, 16);
  if (T.cused <= 1) {
    bw->Write(0, kTBits);
    bw->Write(0, kTBits);
    bw->Write(0, kCBits);
    bw->Write(T.cused ? (uint32_t)T.clast : 0, kCBits);
  } else {
    if (T.tused <= 1) {
      bw->Write(0, kTBits);
      bw->Write((uint32_t)T.tlast, kTBits);
    } else {
      WriteTLensT(T.tlen, bw);
    }
    WriteCLensT(T.clen.data(), T.tlen, T.tcode, bw);
  }
  if (T.pused <= 1) {
    bw->Write(0, m.pbit);
    bw->Write(T.pused ? (uint32_t)T.plast : 0, m.pbit);
  } else {
    WritePLensT(T.plen.data(), m.np, m.pbit, bw);
  }
}

}  // namespace

void LzhufEncode(const Token* tokens, size_t ntokens, const LzhufMethod& m,
                 BitWriterMSB* bw) {
  if (ntokens == 0) return;  // empty stream: no blocks at all
  // Block ranges (parse-block aligned), encoded in parallel and spliced in
  // order (blocks are independent; output bytes identical to the serial
  // loop).
  struct Range { size_t t0, t1; BitWriterMSB bits; };
  std::vector<Range> ranges;
  {
    size_t t0 = 0;
    while (t0 < ntokens) {
      uint32_t blk = tokens[t0].pos / kParseBlock;
      size_t t1 = t0;
      while (t1 < ntokens && tokens[t1].pos / kParseBlock == blk) ++t1;
      ranges.push_back({t0, t1, {}});
      t0 = t1;
    }
  }
  auto encode_range = [&](Range& r) {
    size_t cnt = r.t1 - r.t0;
    std::vector<uint32_t> cfreq(kNC, 0), pfreq(m.np, 0);
    for (size_t t = r.t0; t < r.t1; ++t) {
      const Token& tok = tokens[t];
      if (tok.len == 0) {
        ++cfreq[tok.lit];
      } else {
        ++cfreq[256 + tok.len - 3];
        ++pfreq[BitLength(tok.dist - 1)];
      }
    }
    LzhufTables T = BuildTables(cfreq.data(), pfreq.data(), m);
    BitWriterMSB* w = &r.bits;
    EmitHeader(T, (uint32_t)cnt, m, w);
    for (size_t t = r.t0; t < r.t1; ++t) {
      const Token& tok = tokens[t];
      if (tok.len == 0) {
        if (T.clen[tok.lit]) w->WriteHuff(T.ccode[tok.lit], T.clen[tok.lit]);
      } else {
        int cs = 256 + tok.len - 3;
        if (T.clen[cs]) w->WriteHuff(T.ccode[cs], T.clen[cs]);
        uint32_t pv = tok.dist - 1;
        int c = BitLength(pv);
        if (T.plen[c]) w->WriteHuff(T.pcode[c], T.plen[c]);
        if (c > 1) w->Write(pv & ((1u << (c - 1)) - 1), c - 1);
      }
    }
  };
  std::atomic<size_t> next(0);
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= ranges.size()) return;
      encode_range(ranges[i]);
    }
  };
  unsigned nt = std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > ranges.size()) nt = (unsigned)ranges.size();
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  for (auto& r : ranges) r.bits.AppendTo(bw);
}

int LzhufPlan(const uint32_t* c_freq, const uint32_t* p_freq,
              const uint32_t* token_counts, int32_t nb, int32_t dict_bits,
              int64_t* body_bit_offset, int64_t* total_bits_out,
              uint8_t* c_len_out, uint16_t* c_code_out, uint8_t* p_len_out,
              uint16_t* p_code_out, uint8_t* header_stream,
              size_t header_cap) {
  LzhufMethod m = LzhufMethodFor(dict_bits);
  AbsBitWriterMSB aw(header_stream, header_cap, 0);
  for (int b = 0; b < nb; ++b) {
    LzhufTables T = BuildTables(c_freq + (size_t)b * kNC,
                                p_freq + (size_t)b * m.np, m);
    EmitHeader(T, token_counts[b], m, &aw);
    body_bit_offset[b] = (int64_t)aw.pos();
    uint64_t body = 0;
    for (int s = 0; s < kNC; ++s)
      body += (uint64_t)c_freq[(size_t)b * kNC + s] * T.clen[s];
    for (int c = 0; c < m.np; ++c)
      body += (uint64_t)p_freq[(size_t)b * m.np + c] *
              (T.plen[c] + (c > 1 ? c - 1 : 0));
    aw.set_pos(aw.pos() + body);
    std::memcpy(c_len_out + (size_t)b * kNC, T.clen.data(), kNC);
    std::memcpy(p_len_out + (size_t)b * 20, T.plen.data(), m.np);
    // codes are 32-bit internally (bzip2 needs >16-bit codes); lzhuf codes
    // are <= 16 bits, narrow element-wise for the u16 ABI
    for (int sym = 0; sym < kNC; ++sym)
      c_code_out[(size_t)b * kNC + sym] = (uint16_t)T.ccode[sym];
    for (int c = 0; c < m.np; ++c)
      p_code_out[(size_t)b * 20 + c] = (uint16_t)T.pcode[c];
  }
  *total_bits_out = (int64_t)aw.pos();
  return 0;
}

void LzhufEncodeBytes(const uint8_t* in, size_t n, const LzhufMethod& m,
                      int max_chain, BitWriterMSB* bw) {
  LzssParams p;
  p.window = 1 << m.dict_bits;
  p.min_match = 3;
  p.max_match = 256;
  p.max_chain = max_chain;
  p.hash_bits = 15;
  p.block_size = 32768;
  p.lazy = false;
  std::vector<Token> tokens;
  LzssTokenize(in, n, p, &tokens);
  LzhufEncode(tokens.data(), tokens.size(), m, bw);
  bw->AlignByte();
}

int LzhufDecode(const uint8_t* in, size_t n, const LzhufMethod& m,
                size_t orig_size, std::vector<uint8_t>* out) {
  BitReaderMSB br(in, n);
  out->reserve(out->size() + orig_size);
  size_t produced = 0;
  while (produced < orig_size) {
    uint32_t cnt = br.Read(16);
    if (br.Overrun()) return kStatusUnexpectedEof;
    if (cnt == 0) return kStatusDataError;
    uint8_t tlen[kNT];
    uint16_t t_const;
    int st = ReadTLens(&br, tlen, &t_const);
    if (st) return st;
    HuffDecodeTable ttab;
    if (t_const == 0xffff) {
      if (!BuildDecodeTable(tlen, kNT, /*lsb=*/false, &ttab))
        return kStatusDataError;
    }
    std::vector<uint8_t> clen(kNC);
    uint16_t c_const;
    st = ReadCLens(&br, ttab, t_const, clen.data(), &c_const);
    if (st) return st;
    HuffDecodeTable ctab;
    if (c_const == 0xffff) {
      if (!BuildDecodeTable(clen.data(), kNC, /*lsb=*/false, &ctab) ||
          ctab.bits == 0)
        return kStatusDataError;
    }
    uint8_t plen[20];
    uint16_t p_const;
    st = ReadPLens(&br, m.np, m.pbit, plen, &p_const);
    if (st) return st;
    HuffDecodeTable ptab;
    if (p_const == 0xffff) {
      if (!BuildDecodeTable(plen, m.np, /*lsb=*/false, &ptab))
        return kStatusDataError;
    }
    for (uint32_t t = 0; t < cnt && produced < orig_size; ++t) {
      int sym;
      if (c_const != 0xffff) {
        sym = c_const;
      } else {
        uint32_t e = ctab.entries[br.Peek(ctab.bits)];
        int len = (int)(e & 0x1f);
        if (len == 0) return kStatusDataError;
        br.Consume(len);
        sym = (int)(e >> 5);
      }
      if (br.Overrun()) return kStatusUnexpectedEof;
      if (sym < 256) {
        out->push_back((uint8_t)sym);
        ++produced;
      } else {
        if (sym >= kNC) return kStatusDataError;
        uint32_t mlen = sym - 256 + 3;
        int c;
        if (p_const != 0xffff) {
          c = p_const;
        } else {
          uint32_t e = ptab.entries[br.Peek(ptab.bits)];
          int len = (int)(e & 0x1f);
          if (len == 0) return kStatusDataError;
          br.Consume(len);
          c = (int)(e >> 5);
        }
        uint32_t p = (uint32_t)c;
        if (c > 1) p = (1u << (c - 1)) | br.Read(c - 1);
        if (br.Overrun()) return kStatusUnexpectedEof;
        uint32_t dist = p + 1;
        if (dist > out->size()) return kStatusDataError;
        size_t from = out->size() - dist;
        for (uint32_t kk = 0; kk < mlen; ++kk)
          out->push_back((*out)[from + kk]);
        produced += mlen;
      }
    }
    if (produced > orig_size) return kStatusDataError;
  }
  return kStatusOk;
}

struct LzhufStream::Impl {
  LzhufMethod m;
  uint64_t orig;
  std::vector<uint8_t> buf;   // compressed bytes (trimmed below cursor)
  uint64_t cursor = 0;        // committed bit position into buf
  bool in_block = false;      // header parsed, tokens pending
  uint32_t cnt = 0, t = 0;    // block token count / tokens committed
  uint16_t c_const = 0xffff, p_const = 0xffff;
  HuffDecodeTable ctab, ptab;
  std::vector<uint8_t> out;
  size_t produced = 0;
  int err = 0;
  bool done = false;
};

LzhufStream::LzhufStream(const LzhufMethod& m, uint64_t orig_size)
    : impl_(new Impl) {
  impl_->m = m;
  impl_->orig = orig_size;
  impl_->done = (orig_size == 0);
}
LzhufStream::~LzhufStream() { delete impl_; }
bool LzhufStream::finished() const { return impl_->done; }
std::vector<uint8_t>& LzhufStream::out() { return impl_->out; }

int LzhufStream::Feed(const uint8_t* data, size_t len) {
  Impl* s = impl_;
  if (len) s->buf.insert(s->buf.end(), data, data + len);
  if (s->err || s->done) return s->err;
  // Trim consumed whole bytes (keep the cursor byte) so long streams
  // don't accumulate compressed input forever.
  if ((s->cursor >> 3) > (1u << 16)) {
    size_t drop = (size_t)(s->cursor >> 3);
    s->buf.erase(s->buf.begin(), s->buf.begin() + drop);
    s->cursor &= 7;
  }
  // A nonzero helper status while the reader has padded past the real
  // input is indistinguishable from truncation (zero padding can mimic
  // a bad pattern), so overrun always means "wait for more bytes".
  auto wait_or_err = [&](int st, const BitReaderMSB& br) {
    if (br.Overrun()) return 0;
    s->err = st ? st : kStatusDataError;
    return s->err;
  };
  for (;;) {
    size_t byte0 = (size_t)(s->cursor >> 3);
    BitReaderMSB br(s->buf.data() + byte0, s->buf.size() - byte0);
    uint64_t base = (uint64_t)byte0 * 8;
    if (s->cursor & 7) br.Read((int)(s->cursor & 7));
    if (!s->in_block) {
      uint32_t cnt = br.Read(16);
      if (br.Overrun()) return 0;
      if (cnt == 0) { s->err = kStatusDataError; return s->err; }
      uint8_t tlen[kNT];
      uint16_t t_const;
      int st = ReadTLens(&br, tlen, &t_const);
      if (st) return wait_or_err(st, br);
      HuffDecodeTable ttab;
      if (t_const == 0xffff &&
          !BuildDecodeTable(tlen, kNT, /*lsb=*/false, &ttab))
        return wait_or_err(kStatusDataError, br);
      std::vector<uint8_t> clen(kNC);
      st = ReadCLens(&br, ttab, t_const, clen.data(), &s->c_const);
      if (st) return wait_or_err(st, br);
      if (s->c_const == 0xffff &&
          (!BuildDecodeTable(clen.data(), kNC, /*lsb=*/false, &s->ctab) ||
           s->ctab.bits == 0))
        return wait_or_err(kStatusDataError, br);
      uint8_t plen[20];
      st = ReadPLens(&br, s->m.np, s->m.pbit, plen, &s->p_const);
      if (st) return wait_or_err(st, br);
      if (s->p_const == 0xffff &&
          !BuildDecodeTable(plen, s->m.np, /*lsb=*/false, &s->ptab))
        return wait_or_err(kStatusDataError, br);
      s->cnt = cnt;
      s->t = 0;
      s->in_block = true;
      s->cursor = base + br.BitsConsumed();
    }
    // Token loop: commit per token; an overrun rolls back only the
    // failing token (output + produced) and waits for the next feed.
    while (s->t < s->cnt && s->produced < s->orig) {
      size_t osz = s->out.size();
      size_t prod0 = s->produced;
      int sym;
      if (s->c_const != 0xffff) {
        sym = s->c_const;
      } else {
        uint32_t e = s->ctab.entries[br.Peek(s->ctab.bits)];
        int l = (int)(e & 0x1f);
        if (l == 0) return wait_or_err(kStatusDataError, br);
        br.Consume(l);
        sym = (int)(e >> 5);
      }
      if (br.Overrun()) return 0;
      if (sym < 256) {
        s->out.push_back((uint8_t)sym);
        ++s->produced;
      } else {
        if (sym >= kNC) return wait_or_err(kStatusDataError, br);
        uint32_t mlen = (uint32_t)sym - 256 + 3;
        int c;
        if (s->p_const != 0xffff) {
          c = s->p_const;
        } else {
          uint32_t e = s->ptab.entries[br.Peek(s->ptab.bits)];
          int l = (int)(e & 0x1f);
          if (l == 0) return wait_or_err(kStatusDataError, br);
          br.Consume(l);
          c = (int)(e >> 5);
        }
        uint32_t p = (uint32_t)c;
        if (c > 1) p = (1u << (c - 1)) | br.Read(c - 1);
        if (br.Overrun()) {
          s->out.resize(osz);
          s->produced = prod0;
          return 0;
        }
        uint32_t dist = p + 1;
        if (dist > s->out.size())
          return wait_or_err(kStatusDataError, br);
        size_t from = s->out.size() - dist;
        for (uint32_t kk = 0; kk < mlen; ++kk)
          s->out.push_back(s->out[from + kk]);
        s->produced += mlen;
      }
      ++s->t;
      s->cursor = base + br.BitsConsumed();
      if (s->produced > s->orig) { s->err = kStatusDataError; return s->err; }
    }
    if (s->produced >= s->orig) {
      s->done = true;
      return 0;
    }
    s->in_block = false;  // block complete; next loop parses a header
  }
}

int LzhufIndex(const uint8_t* in, size_t n, const LzhufMethod& m,
               size_t orig_size, int64_t seg_out, int64_t max_segs,
               int64_t max_blocks, int64_t* seg_bits, int64_t* end_bits,
               int64_t* out_lens, int32_t* carry_len, int32_t* carry_dist,
               int32_t* block_ids, uint8_t* c_lens, uint8_t* p_lens,
               int32_t* c_consts, int32_t* p_consts, int64_t* nseg_out,
               int64_t* nblk_out) {
  BitReaderMSB br(in, n);
  int64_t nseg = 0, nblk = 0;
  int64_t produced = 0, seg_start_out = 0;
  int64_t cur_seg_bit = -1;
  int32_t pend_cl = 0, pend_cd = 0;

  auto close_seg = [&](int64_t end_bit, int64_t seg_len, int32_t ncl,
                       int32_t ncd) -> int {
    if (nseg >= max_segs) return kStatusDataError;
    seg_bits[nseg] = cur_seg_bit;
    end_bits[nseg] = end_bit;
    out_lens[nseg] = seg_len;
    carry_len[nseg] = pend_cl;
    carry_dist[nseg] = pend_cd;
    block_ids[nseg] = (int32_t)(nblk - 1);
    ++nseg;
    seg_start_out += seg_len;
    pend_cl = ncl;
    pend_cd = ncd;
    return kStatusOk;
  };

  while (produced < (int64_t)orig_size) {
    int64_t hdr_bit = (int64_t)br.BitsConsumed();
    if (cur_seg_bit >= 0 && produced > seg_start_out) {
      int st = close_seg(hdr_bit, produced - seg_start_out, 0, 0);
      if (st != kStatusOk) return st;
    }
    uint32_t cnt = br.Read(16);
    if (br.Overrun()) return kStatusUnexpectedEof;
    if (cnt == 0) return kStatusDataError;
    if (nblk >= max_blocks) return kStatusDataError;
    uint8_t tlen[kNT];
    uint16_t t_const;
    int st = ReadTLens(&br, tlen, &t_const);
    if (st) return st;
    HuffDecodeTable ttab;
    if (t_const == 0xffff) {
      if (!BuildDecodeTable(tlen, kNT, /*lsb=*/false, &ttab))
        return kStatusDataError;
    }
    uint8_t* clen = c_lens + (size_t)nblk * kNC;
    uint16_t c_const;
    st = ReadCLens(&br, ttab, t_const, clen, &c_const);
    if (st) return st;
    HuffDecodeTable ctab;
    if (c_const == 0xffff) {
      if (!BuildDecodeTable(clen, kNC, /*lsb=*/false, &ctab) ||
          ctab.bits == 0)
        return kStatusDataError;
      for (int s = 0; s < kNC; ++s)
        if (clen[s] > 17) return kStatusDataError;  // device table split
    }
    uint8_t* plen = p_lens + (size_t)nblk * 20;
    uint16_t p_const;
    st = ReadPLens(&br, m.np, m.pbit, plen, &p_const);
    if (st) return st;
    HuffDecodeTable ptab;
    if (p_const == 0xffff) {
      if (!BuildDecodeTable(plen, m.np, /*lsb=*/false, &ptab))
        return kStatusDataError;
      for (int s = 0; s < m.np; ++s)
        if (plen[s] > 17) return kStatusDataError;
    }
    c_consts[nblk] = c_const == 0xffff ? -1 : (int32_t)c_const;
    p_consts[nblk] = p_const == 0xffff ? -1 : (int32_t)p_const;
    ++nblk;
    cur_seg_bit = (int64_t)br.BitsConsumed();

    for (uint32_t t = 0; t < cnt && produced < (int64_t)orig_size; ++t) {
      int sym;
      if (c_const != 0xffff) {
        sym = c_const;
      } else {
        uint32_t e = ctab.entries[br.Peek(ctab.bits)];
        int len = (int)(e & 0x1f);
        if (len == 0) return kStatusDataError;
        br.Consume(len);
        sym = (int)(e >> 5);
      }
      if (br.Overrun()) return kStatusUnexpectedEof;
      uint32_t adv = 1, dist = 0;
      if (sym >= 256) {
        if (sym >= kNC) return kStatusDataError;
        adv = sym - 256 + 3;
        int c;
        if (p_const != 0xffff) {
          c = (int)p_const;
        } else {
          uint32_t e = ptab.entries[br.Peek(ptab.bits)];
          int len = (int)(e & 0x1f);
          if (len == 0) return kStatusDataError;
          br.Consume(len);
          c = (int)(e >> 5);
        }
        uint32_t p = (uint32_t)c;
        if (c > 1) p = (1u << (c - 1)) | br.Read(c - 1);
        if (br.Overrun()) return kStatusUnexpectedEof;
        dist = p + 1;
        if ((int64_t)dist > produced) return kStatusDataError;
      }
      produced += adv;
      int64_t over = produced - (seg_start_out + seg_out);
      if (over >= 0) {
        if (over > 0 && dist == 0) return kStatusDataError;
        int64_t after = (int64_t)br.BitsConsumed();
        int st2 = close_seg(after, seg_out, (int32_t)over, (int32_t)dist);
        if (st2 != kStatusOk) return st2;
        cur_seg_bit = after;
      }
    }
  }
  if (cur_seg_bit >= 0 && produced > seg_start_out) {
    int st = close_seg((int64_t)br.BitsConsumed(),
                       produced - seg_start_out, 0, 0);
    if (st != kStatusOk) return st;
  }
  if (produced != (int64_t)orig_size) return kStatusDataError;
  *nseg_out = nseg;
  *nblk_out = nblk;
  return kStatusOk;
}

}  // namespace tpz
