"""Distributed / multi-host orchestration (SURVEY.md §2.2, §2.3, §5).

The reference crate is strictly single-threaded; everything here is new
framework surface:

  - span sharding: the input stream is cut into independent spans, one
    work item per (host, chip); gzip members and bzip2 streams concatenate
    losslessly, so per-span outputs are standalone and order-preserving
    concat reconstructs a valid stream (BASELINE.json: "sharding
    independent blocks data-parallel ... all-gathering compressed blocks
    in stream order").
  - ordered ragged all-gather: devices produce ragged byte payloads;
    sizes are all-gathered first, offsets are a prefix sum, then padded
    payloads are all-gathered and concatenated by offset
    (tpz/parallel/mesh.py ragged_all_gather for the on-device pattern).
  - manifest/resume: per-span outputs + a JSON manifest (span -> offset,
    size, crc). A re-run skips completed spans, so multi-host jobs are
    restartable at span granularity; the manifest doubles as the ordered-
    concat recipe. Fault injection = deleting a span file (see
    tests/test_parallel.py).
  - multi-host init: jax.distributed.initialize() when TPZ_COORD is set;
    hosts take spans round-robin by process index.
"""

from __future__ import annotations

import json
import os
import zlib as _zlib
from dataclasses import asdict, dataclass

import tpz.api as api

SPAN_BYTES_DEFAULT = 1 << 24  # 16 MiB per work item

#: formats whose streams concatenate losslessly (standalone members)
CONCAT_FORMATS = ("gzip", "bzip2")


def maybe_init_distributed() -> tuple[int, int]:
    """Initialize the multi-host runtime when configured; returns
    (process_index, process_count)."""
    import jax

    coord = os.environ.get("TPZ_COORD")
    if coord and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["TPZ_NPROCS"]),
            process_id=int(os.environ["TPZ_PROC_ID"]),
        )
    return jax.process_index(), jax.process_count()


@dataclass
class SpanResult:
    index: int
    offset: int
    length: int
    out_size: int
    crc32: int


def spans_for(n: int, span_bytes: int = SPAN_BYTES_DEFAULT):
    return [(i, off, min(span_bytes, n - off))
            for i, off in enumerate(range(0, max(n, 1), span_bytes))]


def compress_sharded(
    data: bytes,
    format: str = "gzip",
    level: int = 6,
    backend: str = "auto",
    span_bytes: int = SPAN_BYTES_DEFAULT,
    work_dir: str | None = None,
    process_index: int = 0,
    process_count: int = 1,
    fail_spans: set[int] | None = None,
) -> bytes | None:
    """Data-parallel compression over independent spans.

    With work_dir set, per-span outputs persist as span_<i>.bin and a
    manifest.json records the ordered-concat recipe; completed spans are
    skipped on re-run (checkpoint/resume, SURVEY.md §5). Multi-host: each
    process handles spans with index % process_count == process_index and
    only process 0 returns the assembled stream (others return None once
    their spans are written).

    fail_spans is the fault-injection hook: listed span indices are
    skipped as if the host died; a later call without it completes them.
    """
    if format not in CONCAT_FORMATS:
        raise ValueError(
            f"sharded compression needs a concatenable container; "
            f"{format!r} not in {CONCAT_FORMATS}")
    spans = spans_for(len(data), span_bytes)
    results: dict[int, bytes] = {}
    manifest_path = os.path.join(work_dir, "manifest.json") if work_dir else None
    manifest: dict[str, dict] = {}
    if manifest_path and os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))

    # Collect this process's pending spans, then encode them in ONE batched
    # call (device: a single stage1/stage2 invocation covers every span;
    # host: the threaded batch path).
    pending = []
    for i, off, ln in spans:
        if i % process_count != process_index and work_dir is None:
            raise ValueError("multi-process mode requires work_dir")
        if i % process_count != process_index:
            continue
        span_file = os.path.join(work_dir, f"span_{i}.bin") if work_dir else None
        meta = manifest.get(str(i))
        if span_file and meta and os.path.exists(span_file):
            blob = open(span_file, "rb").read()
            if len(blob) == meta["out_size"] and _zlib.crc32(blob) == meta["crc32"]:
                results[i] = blob
                continue  # resume: span already done
        if fail_spans and i in fail_spans:
            continue  # injected fault: this span's host "died"
        pending.append((i, off, ln))
    if pending:
        blobs = api.compress_many(
            [data[off:off + ln] for _, off, ln in pending], format,
            level=level, backend=backend)
        for (i, off, ln), blob in zip(pending, blobs):
            results[i] = blob
            if work_dir:
                with open(os.path.join(work_dir, f"span_{i}.bin"), "wb") as f:
                    f.write(blob)
                manifest[str(i)] = asdict(SpanResult(
                    i, off, ln, len(blob), _zlib.crc32(blob)))
        if work_dir:
            with open(manifest_path, "w") as f:
                json.dump(manifest, f)

    if process_count > 1 and process_index != 0:
        return None
    # Ordered concat (process 0 / single process). Missing spans mean a
    # fault: the caller re-runs (resume path) until complete.
    out = bytearray()
    for i, off, ln in spans:
        if i in results:
            out += results[i]
            continue
        if work_dir:
            span_file = os.path.join(work_dir, f"span_{i}.bin")
            if os.path.exists(span_file):
                out += open(span_file, "rb").read()
                continue
        raise RuntimeError(f"span {i} incomplete (failed host?); re-run to "
                           f"resume from manifest")
    return bytes(out)
