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

            if bzip2_pipeline.usable():
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

            if bzip2_pipeline.usable():
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

        if not bzip2_pipeline.usable():
            raise RuntimeError("tpu backend requested but unusable")
        results = bzip2_pipeline.decompress_walk_many(datas)
    return [r if r is not None else oracle.bzip2_decode(d)
            for r, d in zip(results, datas)]


def decompress(data: bytes, backend: str = "auto") -> bytes:
    # Device decode is opt-in: over this environment's relay the host C++
    # decoder is faster end-to-end; the device path exists for
    # accelerator-resident pipelines and capability parity.
    if backend == "tpu":
        from tpz.kernels import bzip2_pipeline

        if not bzip2_pipeline.usable():
            raise RuntimeError("tpu backend requested but unusable")
        out = bzip2_pipeline.decompress(data)
        if out is not None:  # unsupported shapes fall through
            return out
    return oracle.bzip2_decode(data)
