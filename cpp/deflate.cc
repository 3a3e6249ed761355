#include "deflate.h"

#include <algorithm>
#include <cstring>

#include "generated_constants.h"
#include "huffman.h"

namespace tpz {

namespace {

constexpr int kStatusOk = 0;
constexpr int kStatusDataError = 1;
constexpr int kStatusUnexpectedEof = 2;

struct ClToken {
  uint8_t sym;        // 0..18
  uint8_t extra_bits; // 0, 2, 3 or 7
  uint8_t extra_val;
};

// RLE of the joint (litlen ++ dist) code-length sequence, RFC 1951 §3.2.7.
void ClEncode(const uint8_t* seq, int len, std::vector<ClToken>* out) {
  int i = 0;
  while (i < len) {
    uint8_t v = seq[i];
    int run = 1;
    while (i + run < len && seq[i + run] == v) ++run;
    if (v == 0) {
      int r = run;
      while (r >= 11) {
        int take = std::min(r, 138);
        out->push_back({18, 7, (uint8_t)(take - 11)});
        r -= take;
      }
      if (r >= 3) {
        out->push_back({17, 3, (uint8_t)(r - 3)});
        r = 0;
      }
      while (r-- > 0) out->push_back({0, 0, 0});
    } else {
      out->push_back({v, 0, 0});
      int r = run - 1;
      while (r >= 3) {
        int take = std::min(r, 6);
        out->push_back({16, 2, (uint8_t)(take - 3)});
        r -= take;
      }
      while (r-- > 0) out->push_back({v, 0, 0});
    }
    i += run;
  }
}

struct BlockPlan {
  // Symbol streams (precomputed once, reused for cost + emit).
  uint32_t lit_freq[288] = {0};
  uint32_t dist_freq[32] = {0};
  uint64_t extra_bits_total = 0;
  // Dynamic header pieces.
  uint8_t lit_len[288] = {0};
  uint8_t dist_len[32] = {0};
  uint16_t lit_code[288];
  uint16_t dist_code[32];
  int nlit = 257, ndist = 1, ncl = 4;
  uint8_t cl_len[19] = {0};
  uint16_t cl_code[19];
  std::vector<ClToken> cl_tokens;
  uint64_t dyn_body_bits = 0, dyn_header_bits = 0, fixed_body_bits = 0;
};

void PlanBlock(const Token* tokens, size_t ntokens, BlockPlan* bp) {
  bp->lit_freq[256] = 1;  // EOB
  for (size_t t = 0; t < ntokens; ++t) {
    const Token& tok = tokens[t];
    if (tok.len == 0) {
      ++bp->lit_freq[tok.lit];
    } else {
      int ls = kLengthSymTable[tok.len];
      ++bp->lit_freq[ls];
      bp->extra_bits_total += kLengthExtra[ls - 257];
      int ds = (tok.dist <= 256) ? kDistSymLo[tok.dist - 1]
                                 : kDistSymHi[(tok.dist - 1) >> 7];
      ++bp->dist_freq[ds];
      bp->extra_bits_total += kDistExtra[ds];
    }
  }

  PackageMergeLengths(bp->lit_freq, 288, kDeflateMaxBits, bp->lit_len);
  PackageMergeLengths(bp->dist_freq, 30, kDeflateMaxBits, bp->dist_len);
  CanonicalCodes(bp->lit_len, 288, bp->lit_code);
  CanonicalCodes(bp->dist_len, 32, bp->dist_code);

  bp->nlit = 257;
  for (int i = 287; i >= 257; --i)
    if (bp->lit_len[i]) {
      bp->nlit = i + 1;
      break;
    }
  bp->ndist = 1;
  for (int i = 29; i >= 1; --i)
    if (bp->dist_len[i]) {
      bp->ndist = i + 1;
      break;
    }

  uint8_t joint[288 + 32];
  std::memcpy(joint, bp->lit_len, bp->nlit);
  std::memcpy(joint + bp->nlit, bp->dist_len, bp->ndist);
  ClEncode(joint, bp->nlit + bp->ndist, &bp->cl_tokens);

  uint32_t cl_freq[19] = {0};
  for (const auto& c : bp->cl_tokens) ++cl_freq[c.sym];
  PackageMergeLengths(cl_freq, 19, kDeflateMaxClBits, bp->cl_len);
  CanonicalCodes(bp->cl_len, 19, bp->cl_code);
  bp->ncl = 4;
  for (int i = 18; i >= 4; --i)
    if (bp->cl_len[kClOrder[i]]) {
      bp->ncl = i + 1;
      break;
    }

  bp->dyn_header_bits = 5 + 5 + 4 + 3ull * bp->ncl;
  for (const auto& c : bp->cl_tokens)
    bp->dyn_header_bits += bp->cl_len[c.sym] + c.extra_bits;

  uint64_t dyn = 0, fixed = 0;
  for (int s = 0; s < 288; ++s)
    if (bp->lit_freq[s]) {
      dyn += (uint64_t)bp->lit_freq[s] * bp->lit_len[s];
      fixed += (uint64_t)bp->lit_freq[s] * kFixedLitLenLengths[s];
    }
  for (int s = 0; s < 30; ++s)
    if (bp->dist_freq[s]) {
      dyn += (uint64_t)bp->dist_freq[s] * bp->dist_len[s];
      fixed += (uint64_t)bp->dist_freq[s] * kFixedDistLengths[s];
    }
  bp->dyn_body_bits = dyn + bp->extra_bits_total;
  bp->fixed_body_bits = fixed + bp->extra_bits_total;
}

void EmitSymbols(const Token* tokens, size_t ntokens, const uint8_t* lit_len,
                 const uint16_t* lit_code, const uint8_t* dist_len,
                 const uint16_t* dist_code, BitWriterLSB* bw) {
  for (size_t t = 0; t < ntokens; ++t) {
    const Token& tok = tokens[t];
    if (tok.len == 0) {
      bw->WriteHuff(lit_code[tok.lit], lit_len[tok.lit]);
    } else {
      int ls = kLengthSymTable[tok.len];
      bw->WriteHuff(lit_code[ls], lit_len[ls]);
      bw->Write((uint32_t)(tok.len - kLengthBase[ls - 257]),
                kLengthExtra[ls - 257]);
      int ds = (tok.dist <= 256) ? kDistSymLo[tok.dist - 1]
                                 : kDistSymHi[(tok.dist - 1) >> 7];
      bw->WriteHuff(dist_code[ds], dist_len[ds]);
      bw->Write(tok.dist - kDistBase[ds], kDistExtra[ds]);
    }
  }
  bw->WriteHuff(lit_code[256], lit_len[256]);  // EOB
}

void EmitStored(const uint8_t* data, size_t len, bool bfinal, BitWriterLSB* bw) {
  size_t off = 0;
  do {
    size_t chunk = std::min<size_t>(len - off, 65535);
    bool last_chunk = (off + chunk == len);
    bw->Write((bfinal && last_chunk) ? 1 : 0, 1);
    bw->Write(0, 2);  // BTYPE=00
    bw->AlignByte();
    bw->Write((uint32_t)chunk, 16);
    bw->Write((uint32_t)(~chunk) & 0xffff, 16);
    bw->WriteBytes(data + off, chunk);
    off += chunk;
  } while (off < len);
}

}  // namespace

void DeflateEncodeBlock(const uint8_t* block_data, size_t block_len,
                        const Token* tokens, size_t ntokens, bool bfinal,
                        BitWriterLSB* bw) {
  BlockPlan bp;
  PlanBlock(tokens, ntokens, &bp);

  uint64_t dyn_cost = 3 + bp.dyn_header_bits + bp.dyn_body_bits;
  uint64_t fixed_cost = 3 + bp.fixed_body_bits;
  // Stored cost simulated from the current bit position.
  uint64_t stored_cost = 0;
  {
    uint64_t pos = bw->BitLength();
    size_t remaining = block_len, chunks = 0;
    do {
      pos += 3;
      pos += (8 - (pos & 7)) & 7;
      pos += 32;
      size_t chunk = std::min<size_t>(remaining, 65535);
      pos += 8 * chunk;
      remaining -= chunk;
      ++chunks;
    } while (remaining > 0);
    stored_cost = pos - bw->BitLength();
    (void)chunks;
  }

  if (block_len > 0 && stored_cost < dyn_cost && stored_cost < fixed_cost) {
    EmitStored(block_data, block_len, bfinal, bw);
    return;
  }
  if (fixed_cost <= dyn_cost) {
    bw->Write(bfinal ? 1 : 0, 1);
    bw->Write(1, 2);  // BTYPE=01
    uint16_t fl_code[288], fd_code[32];
    uint8_t fd_len[32];
    std::memcpy(fd_len, kFixedDistLengths, 30);
    fd_len[30] = fd_len[31] = 5;
    CanonicalCodes(kFixedLitLenLengths, 288, fl_code);
    CanonicalCodes(fd_len, 32, fd_code);
    EmitSymbols(tokens, ntokens, kFixedLitLenLengths, fl_code, fd_len, fd_code,
                bw);
    return;
  }
  // Dynamic.
  bw->Write(bfinal ? 1 : 0, 1);
  bw->Write(2, 2);  // BTYPE=10
  bw->Write(bp.nlit - 257, 5);
  bw->Write(bp.ndist - 1, 5);
  bw->Write(bp.ncl - 4, 4);
  for (int i = 0; i < bp.ncl; ++i) bw->Write(bp.cl_len[kClOrder[i]], 3);
  for (const auto& c : bp.cl_tokens) {
    bw->WriteHuff(bp.cl_code[c.sym], bp.cl_len[c.sym]);
    if (c.extra_bits) bw->Write(c.extra_val, c.extra_bits);
  }
  EmitSymbols(tokens, ntokens, bp.lit_len, bp.lit_code, bp.dist_len,
              bp.dist_code, bw);
}

void DeflateEncode(const uint8_t* in, size_t n, const DeflateParams& params,
                   BitWriterLSB* bw) {
  std::vector<Token> tokens;
  LzssTokenize(in, n, params.lzss, &tokens);
  if (n == 0) {
    DeflateEncodeBlock(in, 0, nullptr, 0, true, bw);
    bw->AlignByte();
    return;
  }
  const size_t bs = (size_t)params.lzss.block_size;
  size_t t = 0;
  for (size_t start = 0; start < n; start += bs) {
    size_t end = std::min(n, start + bs);
    size_t t0 = t;
    while (t < tokens.size() && tokens[t].pos < end) ++t;
    DeflateEncodeBlock(in + start, end - start, tokens.data() + t0, t - t0,
                       end == n, bw);
  }
  bw->AlignByte();
}

// ---------------------------------------------------------------------------
// Inflate
// ---------------------------------------------------------------------------

namespace {

struct FixedTables {
  HuffDecodeTable lit, dist;
  FixedTables() {
    BuildDecodeTable(kFixedLitLenLengths, 288, /*lsb=*/true, &lit);
    uint8_t fd[32];
    std::memcpy(fd, kFixedDistLengths, 30);
    fd[30] = fd[31] = 5;
    BuildDecodeTable(fd, 32, /*lsb=*/true, &dist);
  }
};

const FixedTables& GetFixedTables() {
  static FixedTables t;
  return t;
}

// Decode one Huffman symbol via single-level table; returns -1 on invalid.
inline int DecodeSym(BitReaderLSB* br, const HuffDecodeTable& t) {
  br->Fill();
  uint32_t e = t.entries[br->Peek(t.bits)];
  int len = (int)(e & 0x1f);
  if (len == 0) return -1;
  br->Consume(len);
  return (int)(e >> 5);
}

}  // namespace

int Inflate(const uint8_t* in, size_t n, std::vector<uint8_t>* out,
            size_t* consumed_bytes) {
  BitReaderLSB br(in, n);
  bool bfinal = false;
  while (!bfinal) {
    bfinal = br.Read(1) != 0;
    uint32_t btype = br.Read(2);
    if (br.Overrun()) return kStatusUnexpectedEof;
    if (btype == 3) return kStatusDataError;
    if (btype == 0) {
      br.AlignByte();
      uint32_t len = br.Read(16);
      uint32_t nlen = br.Read(16);
      if (br.Overrun()) return kStatusUnexpectedEof;
      if ((len ^ nlen) != 0xffff) return kStatusDataError;
      size_t p = br.BytePos();
      if (p + len > n) return kStatusUnexpectedEof;
      out->insert(out->end(), in + p, in + p + len);
      br.SeekByte(p + len);
      continue;
    }
    HuffDecodeTable dyn_lit, dyn_dist;
    const HuffDecodeTable* lit;
    const HuffDecodeTable* dist;
    if (btype == 1) {
      lit = &GetFixedTables().lit;
      dist = &GetFixedTables().dist;
    } else {
      uint32_t hlit = br.Read(5) + 257;
      uint32_t hdist = br.Read(5) + 1;
      uint32_t hclen = br.Read(4) + 4;
      uint8_t cl_len[19] = {0};
      for (uint32_t i = 0; i < hclen; ++i)
        cl_len[kClOrder[i]] = (uint8_t)br.Read(3);
      if (br.Overrun()) return kStatusUnexpectedEof;
      HuffDecodeTable cl;
      if (!BuildDecodeTable(cl_len, 19, /*lsb=*/true, &cl) || cl.bits == 0)
        return kStatusDataError;
      uint8_t lens[288 + 32] = {0};
      uint32_t total = hlit + hdist;
      uint32_t i = 0;
      while (i < total) {
        int sym = DecodeSym(&br, cl);
        if (br.Overrun()) return kStatusUnexpectedEof;
        if (sym < 0) return kStatusDataError;
        if (sym < 16) {
          lens[i++] = (uint8_t)sym;
        } else if (sym == 16) {
          if (i == 0) return kStatusDataError;
          uint32_t rep = 3 + br.Read(2);
          if (i + rep > total) return kStatusDataError;
          uint8_t v = lens[i - 1];
          while (rep--) lens[i++] = v;
        } else if (sym == 17) {
          uint32_t rep = 3 + br.Read(3);
          if (i + rep > total) return kStatusDataError;
          i += rep;
        } else {
          uint32_t rep = 11 + br.Read(7);
          if (i + rep > total) return kStatusDataError;
          i += rep;
        }
      }
      if (br.Overrun()) return kStatusUnexpectedEof;
      if (!BuildDecodeTable(lens, (int)hlit, /*lsb=*/true, &dyn_lit))
        return kStatusDataError;
      uint8_t dlens[32] = {0};
      std::memcpy(dlens, lens + hlit, hdist);
      if (!BuildDecodeTable(dlens, (int)hdist, /*lsb=*/true, &dyn_dist))
        return kStatusDataError;
      if (dyn_lit.bits == 0) return kStatusDataError;  // no litlen codes
      lit = &dyn_lit;
      dist = &dyn_dist;
    }
    // Symbol loop.
    for (;;) {
      int sym = DecodeSym(&br, *lit);
      if (br.Overrun()) return kStatusUnexpectedEof;
      if (sym < 0) return kStatusDataError;
      if (sym < 256) {
        out->push_back((uint8_t)sym);
        continue;
      }
      if (sym == 256) break;
      if (sym > 285) return kStatusDataError;
      uint32_t len = kLengthBase[sym - 257] + br.Read(kLengthExtra[sym - 257]);
      if (dist->bits == 0) return kStatusDataError;
      int ds = DecodeSym(&br, *dist);
      if (br.Overrun()) return kStatusUnexpectedEof;
      if (ds < 0 || ds > 29) return kStatusDataError;
      uint32_t d = kDistBase[ds] + br.Read(kDistExtra[ds]);
      if (br.Overrun()) return kStatusUnexpectedEof;
      if (d > out->size()) return kStatusDataError;
      size_t from = out->size() - d;
      for (uint32_t k = 0; k < len; ++k)  // overlapping copies are legal
        out->push_back((*out)[from + k]);
    }
  }
  br.AlignByte();
  if (br.Overrun()) return kStatusUnexpectedEof;
  if (consumed_bytes) *consumed_bytes = br.BytePos();
  return kStatusOk;
}

}  // namespace tpz
