"""BZip2 codec.

Parity: reference crate src/bzip2/ `BZip2Encoder::new(level)` /
`BZip2Decoder` ([HIGH] names, SURVEY.md §2.1; behavior pinned by the BZip2
stream format and interop-tested against stdlib bz2). Encode runs on the
C++ oracle or, when an accelerator is available, the device pipeline
(tpz/kernels/bzip2_pipeline.py) for the block transforms.
"""

from __future__ import annotations

from tpz import oracle


def compress(data: bytes, level: int = 9, backend: str = "auto") -> bytes:
    if backend in ("auto", "tpu"):
        try:
            from tpz.kernels import bzip2_pipeline

            if bzip2_pipeline.usable(explicit=(backend == "tpu")):
                return bzip2_pipeline.compress(data, level)
            raise RuntimeError("device pipeline not usable")
        except Exception:
            if backend == "tpu":
                raise
    return oracle.bzip2_encode(data, level)


def compress_many(datas, level: int = 9, backend: str = "auto") -> list:
    """Batched encode: one device BWT invocation covers every buffer."""
    if backend in ("auto", "tpu"):
        try:
            from tpz.kernels import bzip2_pipeline

            if bzip2_pipeline.usable(explicit=(backend == "tpu")):
                return bzip2_pipeline.compress_many(list(datas), level)
            raise RuntimeError("device pipeline not usable")
        except Exception:
            if backend == "tpu":
                raise
    return [oracle.bzip2_encode(d, level) for d in datas]


def decompress_many(datas, backend: str = "auto") -> list[bytes]:
    """Batch decode: with backend="tpu", every stream's blocks share one
    fused device program (tpz/kernels/bzip2_pipeline.decompress_walk_many);
    declined streams fall back to the host decoder individually."""
    datas = list(datas)
    results = [None] * len(datas)
    if backend == "tpu":
        from tpz.kernels import bzip2_pipeline

        if not bzip2_pipeline.usable(explicit=True):
            raise RuntimeError("tpu backend requested but unusable")
        results = bzip2_pipeline.decompress_walk_many(datas)
    return [r if r is not None else oracle.bzip2_decode(d)
            for r, d in zip(results, datas)]


_MAGIC_BLOCK = 0x314159265359
_MAGIC_EOS = 0x177245385090


def _find_magics(buf, start_bit: int, end_bit: int):
    """Bit positions in [start_bit, end_bit - 48] where a 48-bit block or
    EOS magic begins (candidates — compressed payload can contain the
    pattern by chance; callers verify by decoding)."""
    import numpy as np

    b = np.frombuffer(buf, np.uint8)
    lo = max(0, start_bit // 8)
    hi = min(len(b), (end_bit + 7) // 8)
    if hi - lo < 7:
        return []
    w = b[lo:hi].astype(np.uint16)
    out = []
    pats = [(m >> 40, m.to_bytes(6, "big"))
            for m in (_MAGIC_BLOCK, _MAGIC_EOS)]
    for s in range(8):
        if s == 0:
            # Full width: w[:-1] would drop the final byte and miss a
            # byte-aligned magic occupying the last 6 bytes (ADVICE r4).
            sb = w.astype(np.uint8)
        else:
            sb = (((w[:-1] << s) | (w[1:] >> (8 - s))) & 0xFF).astype(
                np.uint8)
        for _, pat in pats:
            cand = np.flatnonzero(sb[: len(sb) - 5] == pat[0])
            for k in range(1, 6):
                if cand.size == 0:
                    break
                cand = cand[sb[cand + k] == pat[k]]
            for c in cand:
                bitpos = (lo + int(c)) * 8 + s
                if start_bit <= bitpos <= end_bit - 48:
                    out.append(bitpos)
    out.sort()
    return out


class IncrementalDecoder:
    """Block-granular streaming .bz2 decode (VERDICT r3 next item 7).

    write(b) appends compressed bytes and returns the plaintext of every
    block that became complete: blocks are delimited by the next 48-bit
    block/EOS magic, searched only over NEW bytes (a cursor + overlap),
    and each completed block decodes alone as a synthesized single-block
    stream through the C++ host decoder (its CRC is validated there; the
    stream's combined CRC is validated at EOS). Cost is O(total bytes)
    across any write pattern — the round-3 facade re-parsed the whole
    accumulated buffer per write, O(n^2). Candidate magics occurring by
    chance inside payload are rejected by the block CRC and skipped."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._base = 0          # global bit position of _buf[0]
        self._state = "header"  # header | block | done-stream tail
        self._level = 9
        self._crcs: list[int] = []
        self._cur = 0           # global bit pos: next undecoded element
        self._scan = 0          # magic starts < _scan have all been found
        self._cands: list[int] = []  # candidate magic starts (global, sorted)
        self._bad: set[int] = set()  # rejected candidate positions
        self.ended_clean = True

    def _peek(self, gbit: int, n: int):
        from tpz.kernels.bzip2_pipeline import _peek_bits

        return _peek_bits(bytes(self._buf), gbit - self._base, n)

    def _end_bit(self) -> int:
        return self._base + 8 * len(self._buf)

    def _extend_scan(self) -> None:
        """Scan NEW bytes for candidate magics, caching every hit.

        The round-4 version advanced the frontier to end-of-buffer after
        consuming only the first candidate, so a later magic already inside
        the buffer was never found again (ADVICE r4 high): a single write()
        of a whole multi-block stream decoded only block 1. The cache keeps
        all of them; _scan is the proven-scanned frontier (every magic
        starting below it is in _cands or consumed)."""
        lim = self._end_bit()
        if lim - 48 < self._scan:
            return
        for c in _find_magics(self._buf, self._scan - self._base,
                              lim - self._base):
            g = c + self._base
            if g >= self._scan:
                self._cands.append(g)
        self._scan = lim - 47

    def _trim(self) -> None:
        cut = (self._cur - self._base) // 8
        if cut > (1 << 16):
            del self._buf[:cut]
            self._base += 8 * cut

    def _synth_block(self, m0: int, m1: int, crc: int) -> bytes:
        """Single-block stream: 'BZh<level>' + bits [m0, m1) + EOS +
        combined CRC (= the block's own CRC)."""
        import numpy as np

        from tpz.kernels.bzip2_pipeline import _splice_eos

        lo = (m0 - self._base) // 8
        hi = min(len(self._buf), (m1 - self._base + 7) // 8 + 1)
        seg = np.frombuffer(self._buf[lo:hi], np.uint8).astype(np.uint16)
        s = (m0 - self._base) & 7
        if s:
            seg = np.append(seg, 0).astype(np.uint16)
            seg = (((seg[:-1] << s) | (seg[1:] >> (8 - s))) & 0xFF)
        body = bytearray(b"BZh" + bytes([0x30 + self._level]))
        body += seg.astype(np.uint8).tobytes()
        return _splice_eos(body, 32 + (m1 - m0), [crc])

    def write(self, data: bytes) -> bytes:
        from tpz.errors import CompressionError, DataError

        self._buf += data
        out = bytearray()
        while True:
            if self._state == "header":
                avail = self._end_bit() - self._cur
                if avail <= 0:
                    break
                self.ended_clean = False
                if avail < 32:
                    break
                hdr = self._peek(self._cur, 32)
                lvl = (hdr & 0xFF) - 0x30
                if (hdr >> 8) != 0x425A68 or not 1 <= lvl <= 9:
                    raise DataError("bad bzip2 stream header")
                self._level = lvl
                self._cur += 32
                # _scan may already sit past _cur (the previous stream's
                # scans ran to end-of-buffer); never rewind it — rescanning
                # would duplicate cached candidates.
                self._scan = max(self._scan, self._cur)
                self._cands = [g for g in self._cands if g >= self._cur]
                self._crcs = []
                self._state = "block"
            elif self._state == "block":
                if self._end_bit() - self._cur < 48:
                    break
                magic = self._peek(self._cur, 48)
                if magic == _MAGIC_EOS:
                    if self._end_bit() - self._cur < 80:
                        break
                    combined = 0
                    for c in self._crcs:
                        combined = (((combined << 1) | (combined >> 31))
                                    ^ c) & 0xFFFFFFFF
                    if self._peek(self._cur + 48, 32) != combined:
                        raise DataError("bzip2 combined CRC mismatch")
                    self._cur = -(-(self._cur + 80) // 8) * 8
                    self._state = "header"
                    self.ended_clean = True
                    self._trim()
                    continue
                if magic != _MAGIC_BLOCK:
                    raise DataError("bad bzip2 block magic")
                # Find the next magic after this block's start.
                self._extend_scan()
                nxt = None
                for g in self._cands:
                    if g >= self._cur + 48 and g not in self._bad:
                        nxt = g
                        break
                if nxt is None:
                    break
                crc = self._peek(self._cur + 48, 32)
                try:
                    out += oracle.bzip2_decode(
                        self._synth_block(self._cur, nxt, crc))
                except CompressionError:
                    # Chance 48-bit pattern inside payload: not a real
                    # boundary. Skip it and try the next cached candidate.
                    self._bad.add(nxt)
                    continue
                self._crcs.append(crc)
                self._bad = {b for b in self._bad if b > nxt}
                self._cands = [g for g in self._cands if g >= nxt]
                self._cur = nxt
                self._trim()
            else:  # pragma: no cover
                break
        return bytes(out)

    def finish(self) -> bytes:
        from tpz.errors import UnexpectedEof

        out = self.write(b"")
        if not self.ended_clean or (self._state == "block"):
            raise UnexpectedEof("bzip2 stream truncated")
        if self._state == "header" and self._end_bit() > self._cur:
            raise UnexpectedEof("bzip2 stream truncated")
        return out


def decompress(data: bytes, backend: str = "auto") -> bytes:
    # Device decode is opt-in: over this environment's relay the host C++
    # decoder is faster end-to-end; the device path exists for
    # accelerator-resident pipelines and capability parity.
    if backend == "tpu":
        from tpz.kernels import bzip2_pipeline

        if not bzip2_pipeline.usable(explicit=True):
            raise RuntimeError("tpu backend requested but unusable")
        out = bzip2_pipeline.decompress(data)
        if out is not None:  # unsupported shapes fall through
            return out
    return oracle.bzip2_decode(data)
