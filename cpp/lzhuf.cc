#include "lzhuf.h"

#include <algorithm>
#include <cstring>

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
constexpr size_t kTokensPerBlock = 32768;

inline int BitLength(uint32_t v) {
  int c = 0;
  while (v) {
    ++c;
    v >>= 1;
  }
  return c;
}

// ---- table writers (ar002-compatible layout) ----

// T-table: lengths of the 19-symbol C-length alphabet.
void WriteTLens(const uint8_t* lens, BitWriterMSB* bw) {
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
void WriteCLens(const uint8_t* clen, const uint8_t* tlen,
                const uint16_t* tcode, BitWriterMSB* bw) {
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
void WritePLens(const uint8_t* lens, int np, int cbits, BitWriterMSB* bw) {
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

void LzhufEncode(const Token* tokens, size_t ntokens, const LzhufMethod& m,
                 BitWriterMSB* bw) {
  if (ntokens == 0) return;  // empty stream: no blocks at all
  size_t t0 = 0;
  while (t0 < ntokens) {
    size_t cnt = std::min(kTokensPerBlock, ntokens - t0);
    // Histograms.
    std::vector<uint32_t> cfreq(kNC, 0), pfreq(m.np, 0);
    for (size_t t = t0; t < t0 + cnt; ++t) {
      const Token& tok = tokens[t];
      if (tok.len == 0) {
        ++cfreq[tok.lit];
      } else {
        ++cfreq[256 + tok.len - 3];
        ++pfreq[BitLength(tok.dist - 1)];
      }
    }
    std::vector<uint8_t> clen(kNC, 0), plen(m.np, 0);
    PackageMergeLengths(cfreq.data(), kNC, kMaxLen, clen.data());
    PackageMergeLengths(pfreq.data(), m.np, kMaxLen, plen.data());
    // Single-symbol tables use the constant form (length 0 convention).
    int cused = 0, clast = 0, pused = 0, plast = 0;
    for (int s = 0; s < kNC; ++s)
      if (cfreq[s]) {
        ++cused;
        clast = s;
      }
    for (int s = 0; s < m.np; ++s)
      if (pfreq[s]) {
        ++pused;
        plast = s;
      }
    std::vector<uint16_t> ccode(kNC, 0), pcode(m.np, 0);

    bw->Write((uint32_t)cnt, 16);

    if (cused <= 1) {
      // constant C table: write empty T table then C count==0 + symbol
      bw->Write(0, kTBits);
      bw->Write(0, kTBits);
      bw->Write(0, kCBits);
      bw->Write(cused ? (uint32_t)clast : 0, kCBits);
      std::fill(clen.begin(), clen.end(), 0);
    } else {
      CanonicalCodes(clen.data(), kNC, ccode.data());
      // T-table: histogram of the C-length RLE symbols.
      uint32_t tfreq[kNT] = {0};
      {
        int n = kNC;
        while (n > 0 && clen[n - 1] == 0) --n;
        int i = 0;
        while (i < n) {
          if (clen[i] == 0) {
            int run = 0;
            while (i + run < n && clen[i + run] == 0) ++run;
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
            ++tfreq[clen[i] + 2];
            ++i;
          }
        }
      }
      uint8_t tlen[kNT] = {0};
      PackageMergeLengths(tfreq, kNT, kTLen, tlen);
      int tused = 0, tlast = 0;
      for (int s = 0; s < kNT; ++s)
        if (tfreq[s]) {
          ++tused;
          tlast = s;
        }
      uint16_t tcode[kNT] = {0};
      if (tused <= 1) {
        std::memset(tlen, 0, sizeof(tlen));
        bw->Write(0, kTBits);
        bw->Write((uint32_t)tlast, kTBits);
      } else {
        CanonicalCodes(tlen, kNT, tcode);
        WriteTLens(tlen, bw);
      }
      WriteCLens(clen.data(), tlen, tcode, bw);
    }

    if (pused <= 1) {
      bw->Write(0, m.pbit);
      bw->Write(pused ? (uint32_t)plast : 0, m.pbit);
      std::fill(plen.begin(), plen.end(), 0);
    } else {
      CanonicalCodes(plen.data(), m.np, pcode.data());
      WritePLens(plen.data(), m.np, m.pbit, bw);
    }

    // Tokens.
    for (size_t t = t0; t < t0 + cnt; ++t) {
      const Token& tok = tokens[t];
      if (tok.len == 0) {
        if (clen[tok.lit]) bw->WriteHuff(ccode[tok.lit], clen[tok.lit]);
        // constant C table: zero bits
      } else {
        int cs = 256 + tok.len - 3;
        if (clen[cs]) bw->WriteHuff(ccode[cs], clen[cs]);
        uint32_t p = tok.dist - 1;
        int c = BitLength(p);
        if (plen[c]) bw->WriteHuff(pcode[c], plen[c]);
        if (c > 1) bw->Write(p & ((1u << (c - 1)) - 1), c - 1);
      }
    }
    t0 += cnt;
    if (ntokens == 0) break;
  }
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

}  // namespace tpz
