#!/usr/bin/env python
"""Real-TPU compile + run gate (VERDICT r4 next item 2).

Compiles and RUNS every Pallas kernel family on the actual device at
small shapes, end-to-end through the public codec surface, and checks
byte-exact round-trips. Interpret-mode tests cannot see Mosaic
compilation failures (round 4 shipped four walks the chip rejected);
this gate is the thing that must pass before any round-end snapshot.

Coverage (each row = one device program family):
  deflate_encode   — suffix screen + v3y parse walk + device plan + bitpack
  deflate_decode   — inflate symbol walk + materialize + resolve_walk copy
                     machine (TZ-indexed member)
  deflate_foreign  — host segment indexer + same walk (foreign zlib bytes)
  lzhuf_encode     — LZSS/Huffman device pipeline, MSB bitpack
  lzhuf_decode     — lzhuf symbol walk + shared resolve
  bzip2_encode     — fused RLE1+BWT+MTF+RLE2+MXU coder+MSB bitpack
  bzip2_decode     — header scan + symbol walk + iBWT segment walk

Exit code 0 = every row ran on the TPU and round-tripped. Any failure
prints the row + exception and exits 1. Output: one JSON line per row
plus a final summary line (machine-readable for BASELINE.md).

Run via `make selftest-tpu`. Requires the axon relay (or a real TPU
backend); refuses to "pass" on CPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = int(os.environ.get("TPZ_SELFTEST_BYTES", 1 << 20))


def main() -> int:
    import jax

    devs = jax.devices()
    kind = devs[0].platform if devs else "none"
    print(json.dumps({"devices": [str(d) for d in devs]}), flush=True)
    if kind == "cpu":
        print(json.dumps({"selftest_tpu": "FAIL",
                          "reason": "no TPU backend — gate must run on "
                                    "the real chip"}))
        return 1

    from tpz.utils import corpus

    data = bytes(corpus.mixed(SIZE, seed=99))
    rows = []

    def step(name, fn):
        t0 = time.time()
        try:
            ok = bool(fn())
            dt = round(time.time() - t0, 2)
            rows.append({"row": name, "ok": ok, "seconds": dt})
        except Exception as e:  # noqa: BLE001 — report every row
            dt = round(time.time() - t0, 2)
            rows.append({"row": name, "ok": False, "seconds": dt,
                         "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(json.dumps(rows[-1]), flush=True)

    def deflate_encode():
        from tpz import oracle
        from tpz.codecs import deflate

        blob = deflate.compress(data, backend="tpu")
        return oracle.inflate(blob)[0] == data

    def deflate_decode():
        from tpz.codecs import gzip_codec as gz

        blob = gz.compress(data)  # TZ-indexed member (device or oracle)
        return gz.decompress(blob, backend="tpu") == data

    def deflate_foreign():
        import zlib

        from tpz.codecs import zlib_codec as zc

        return zc.decompress(zlib.compress(data, 6), backend="tpu") == data

    def lzhuf_encode():
        from tpz.codecs import lzhuf

        blob = lzhuf.compress(data, method="lh5", backend="tpu")
        return lzhuf.decompress(blob, backend="auto") == data

    def lzhuf_decode():
        from tpz.codecs import lzhuf

        blob = lzhuf.compress(data, method="lh5", backend="auto")
        return lzhuf.decompress(blob, backend="tpu") == data

    def bzip2_encode():
        import bz2

        from tpz.codecs import bzip2

        return bz2.decompress(bzip2.compress(data, 9, backend="tpu")) == data

    def bzip2_decode():
        import bz2

        from tpz.codecs import bzip2

        return bzip2.decompress(bz2.compress(data, 9), backend="tpu") == data

    step("deflate_encode", deflate_encode)
    step("deflate_decode", deflate_decode)
    step("deflate_foreign", deflate_foreign)
    step("lzhuf_encode", lzhuf_encode)
    step("lzhuf_decode", lzhuf_decode)
    step("bzip2_encode", bzip2_encode)
    step("bzip2_decode", bzip2_decode)

    ok = all(r["ok"] for r in rows)
    print(json.dumps({"selftest_tpu": "PASS" if ok else "FAIL",
                      "rows": rows}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
