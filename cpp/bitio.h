// Bit I/O for the CPU oracle — both bit orders.
//
// Parity: reference crate src/bitio/ (BitReader/BitWriter generic over
// direction Left/Right, [MED] SURVEY.md §2.1). LSB-first ("Right") serves
// DEFLATE/zlib/gzip; MSB-first ("Left") serves BZip2/LZHUF. Huffman codes
// in LSB-first streams are emitted most-significant-code-bit first per RFC
// 1951 §3.1.1, i.e. bit-reversed before packing.
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace tpz {

class BitWriterLSB {
 public:
  void Write(uint32_t value, int nbits) {
    buf_ |= (uint64_t)(value & ((1u << nbits) - 1)) << cnt_;
    cnt_ += nbits;
    while (cnt_ >= 8) {
      out_.push_back((uint8_t)(buf_ & 0xff));
      buf_ >>= 8;
      cnt_ -= 8;
    }
  }
  // Huffman code: MSB of the nbits-wide code first => reverse then pack.
  void WriteHuff(uint32_t code, int nbits) {
    uint32_t rev = 0;
    for (int i = 0; i < nbits; ++i) {
      rev = (rev << 1) | (code & 1);
      code >>= 1;
    }
    Write(rev, nbits);
  }
  void AlignByte() {
    if (cnt_ > 0) {
      out_.push_back((uint8_t)(buf_ & 0xff));
      buf_ = 0;
      cnt_ = 0;
    }
  }
  void WriteBytes(const uint8_t* p, size_t n) {
    out_.insert(out_.end(), p, p + n);
  }
  uint64_t BitLength() const { return 8 * out_.size() + cnt_; }
  std::vector<uint8_t>& bytes() { return out_; }

  // Bit-granular splice onto another LSB writer (parallel per-block
  // DEFLATE emission; dynamic/fixed block bodies are offset-independent).
  void AppendTo(BitWriterLSB* dst) const {
    for (uint8_t b : out_) dst->Write(b, 8);
    if (cnt_ > 0) dst->Write((uint32_t)buf_, cnt_);
  }

 private:
  std::vector<uint8_t> out_;
  uint64_t buf_ = 0;
  int cnt_ = 0;
};

class BitWriterMSB {
 public:
  void Write(uint32_t value, int nbits) {
    buf_ = (buf_ << nbits) | (uint64_t)(value & ((nbits == 32) ? 0xffffffffu : ((1u << nbits) - 1)));
    cnt_ += nbits;
    while (cnt_ >= 8) {
      cnt_ -= 8;
      out_.push_back((uint8_t)((buf_ >> cnt_) & 0xff));
    }
    buf_ &= (1ull << cnt_) - 1;
  }
  void WriteHuff(uint32_t code, int nbits) { Write(code, nbits); }
  void AlignByte() {
    if (cnt_ > 0) {
      out_.push_back((uint8_t)((buf_ << (8 - cnt_)) & 0xff));
      buf_ = 0;
      cnt_ = 0;
    }
  }
  uint64_t BitLength() const { return 8 * out_.size() + cnt_; }
  std::vector<uint8_t>& bytes() { return out_; }

  // Append this writer's whole bit stream onto another MSB writer
  // (bit-granular splice; used to join independently encoded bzip2
  // blocks, which are not byte-aligned in the stream).
  void AppendTo(BitWriterMSB* dst) const {
    for (uint8_t b : out_) dst->Write(b, 8);
    if (cnt_ > 0) dst->Write((uint32_t)buf_, cnt_);
  }

 private:
  std::vector<uint8_t> out_;
  uint64_t buf_ = 0;
  int cnt_ = 0;
};

// LSB-first reader with a 64-bit refill buffer. Peek/Consume style for the
// table-driven inflate hot loop.
class BitReaderLSB {
 public:
  BitReaderLSB(const uint8_t* data, size_t n) : data_(data), n_(n) {}

  // Ensure >= nbits in buffer (zero-padded past end; caller checks overrun
  // via Overrun() after the fact).
  inline void Fill() {
    while (cnt_ <= 56) {
      uint64_t b = (pos_ < n_) ? data_[pos_] : 0;
      if (pos_ >= n_) padded_ += 8;
      ++pos_;
      buf_ |= b << cnt_;
      cnt_ += 8;
    }
  }
  inline uint32_t Peek(int nbits) const {
    return (uint32_t)(buf_ & ((1ull << nbits) - 1));
  }
  inline void Consume(int nbits) {
    buf_ >>= nbits;
    cnt_ -= nbits;
  }
  inline uint32_t Read(int nbits) {
    Fill();
    uint32_t v = Peek(nbits);
    Consume(nbits);
    return v;
  }
  void AlignByte() {
    int drop = cnt_ & 7;
    Consume(drop);
  }
  // Byte position of the next unconsumed byte (requires byte alignment).
  size_t BytePos() const { return pos_ - (size_t)(cnt_ / 8); }
  // Absolute bit position of the next unconsumed bit.
  uint64_t BitPos() const { return 8ull * pos_ - (uint64_t)cnt_; }
  void SeekByte(size_t p) {
    pos_ = p;
    buf_ = 0;
    cnt_ = 0;
    // Discarded buffer bits were never consumed; padding among them must
    // not count as an overrun (callers bounds-check the seek target).
    padded_ = 0;
  }
  // True if consumed bits ran past the real input.
  bool Overrun() const {
    return padded_ > cnt_ || (padded_ > 0 && BytePos() > n_);
  }
  size_t size() const { return n_; }
  const uint8_t* data() const { return data_; }

 private:
  const uint8_t* data_;
  size_t n_;
  size_t pos_ = 0;
  uint64_t buf_ = 0;
  int cnt_ = 0;
  int padded_ = 0;  // zero bits injected past end-of-input
};

// MSB-first reader (BZip2 / LZHUF).
class BitReaderMSB {
 public:
  BitReaderMSB(const uint8_t* data, size_t n) : data_(data), n_(n) {}

  inline void Fill() {
    while (cnt_ <= 56) {
      uint64_t b = (pos_ < n_) ? data_[pos_] : 0;
      if (pos_ >= n_) padded_ += 8;
      ++pos_;
      buf_ = (buf_ << 8) | b;
      cnt_ += 8;
    }
  }
  inline uint32_t Peek(int nbits) {
    Fill();
    return (uint32_t)((buf_ >> (cnt_ - nbits)) & ((1ull << nbits) - 1));
  }
  inline void Consume(int nbits) {
    cnt_ -= nbits;
    buf_ &= (cnt_ >= 64) ? ~0ull : ((1ull << cnt_) - 1);
  }
  inline uint32_t Read(int nbits) {
    if (nbits == 0) return 0;
    uint32_t v = Peek(nbits);
    Consume(nbits);
    return v;
  }
  bool Overrun() const { return padded_ > cnt_; }
  uint64_t BitsConsumed() const { return 8 * (uint64_t)pos_ - cnt_; }
  size_t size() const { return n_; }

 private:
  const uint8_t* data_;
  size_t n_;
  size_t pos_ = 0;
  uint64_t buf_ = 0;
  int cnt_ = 0;
  int padded_ = 0;
};

}  // namespace tpz
