"""Parallel / distributed machinery on the 8-device virtual CPU mesh
(SURVEY.md §4 item 3): sharded encode step, ordered ragged all-gather,
span sharding + manifest/resume + fault injection."""

import gzip as stdgzip
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpz import oracle
from tpz.parallel import distributed
from tpz.parallel.mesh import make_mesh, ragged_all_gather, sharded_encode_step
from tpz.utils import corpus


def test_ragged_all_gather_order():
    mesh = make_mesh(8)
    cap = 64
    rng = np.random.default_rng(0)
    sizes = rng.integers(1, cap, size=8).astype(np.int32)
    pay = np.zeros((8, cap), np.uint8)
    chunks = []
    for d in range(8):
        c = rng.integers(0, 256, size=sizes[d]).astype(np.uint8)
        pay[d, : sizes[d]] = c
        chunks.append(c.tobytes())
    out, total = ragged_all_gather(mesh, jnp.asarray(pay), jnp.asarray(sizes))
    expect = b"".join(chunks)
    assert int(total) == len(expect)
    assert np.asarray(out)[: len(expect)].tobytes() == expect


def test_sharded_encode_step_token_counts():
    mesh = make_mesh(8)
    step = sharded_encode_step(mesh, k=4, window=512, block=1024)
    nb = 16
    data = np.frombuffer(corpus.mixed(nb * 1024), np.uint8)
    base = jnp.asarray(data.reshape(nb, 1024))
    span_off = jnp.asarray((np.arange(nb) * 1024).astype(np.int32))
    _, _, _, counts = step(base, span_off, jnp.int32(nb * 1024))
    counts = np.asarray(counts)
    assert counts.shape == (nb,) and (counts > 0).all()


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
def test_compress_sharded_gzip(tmp_path):
    data = corpus.mixed(3_000_000)
    blob = distributed.compress_sharded(
        data, "gzip", span_bytes=1 << 20, work_dir=str(tmp_path),
        backend="oracle")
    assert stdgzip.decompress(blob) == data
    # manifest exists and covers all spans
    import json

    manifest = json.load(open(tmp_path / "manifest.json"))
    assert len(manifest) == 3


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
def test_fault_injection_and_resume(tmp_path):
    data = corpus.mixed(2_000_000)
    # First run: span 1 "dies".
    with pytest.raises(RuntimeError, match="span 1 incomplete"):
        distributed.compress_sharded(
            data, "bzip2", span_bytes=1 << 20, work_dir=str(tmp_path),
            backend="oracle", fail_spans={1})
    # Resume: only span 1 is recomputed; result is complete and valid.
    import bz2

    blob = distributed.compress_sharded(
        data, "bzip2", span_bytes=1 << 20, work_dir=str(tmp_path),
        backend="oracle")
    assert bz2.decompress(blob) == data


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
def test_multi_process_simulation(tmp_path):
    """Two 'hosts' each compress their spans; host 0 assembles."""
    data = corpus.mixed(2_500_000)
    r1 = distributed.compress_sharded(
        data, "gzip", span_bytes=1 << 20, work_dir=str(tmp_path),
        process_index=1, process_count=2, backend="oracle")
    assert r1 is None
    blob = distributed.compress_sharded(
        data, "gzip", span_bytes=1 << 20, work_dir=str(tmp_path),
        process_index=0, process_count=2, backend="oracle")
    assert stdgzip.decompress(blob) == data


def test_sharded_rejects_non_concat_format():
    with pytest.raises(ValueError):
        distributed.compress_sharded(b"x" * 100, "zlib")


def test_metrics_report():
    from tpz.utils import metrics

    r = metrics.measure("gzip", lambda d: stdgzip.compress(d),
                        corpus.text(10_000))
    j = r.to_json()
    assert '"codec": "gzip"' in j and r.ratio < 1.0 and r.gbps > 0
    assert metrics.scaling_efficiency(10.0, 5.5, 2) == pytest.approx(0.909, 0.01)


def test_sharded_compress_byte_identity():
    """VERDICT r1 #5: the composed stage1 -> device plan -> bitpack ->
    ordered ragged all-gather under one mesh emits an actual multi-member
    gzip stream, byte-identical to the single-device path."""
    import gzip as stdgz

    from tpz.codecs import gzip_codec
    from tpz.kernels.matchfinder import BLOCK
    from tpz.parallel.mesh import make_mesh, sharded_compress
    from tpz.utils import corpus

    mesh = make_mesh(8)
    n = 8 * BLOCK + 23456  # ragged tail: padding blocks + an empty shard
    data = corpus.mixed(n)
    out = sharded_compress(data, mesh)
    assert stdgz.decompress(out) == data
    assert gzip_codec.decompress(out) == data
    nb_total = (n + BLOCK - 1) // BLOCK
    nb_per = (nb_total + 7) // 8
    sb = nb_per * BLOCK
    spans = [data[i * sb:(i + 1) * sb] for i in range(8)]
    expect = b"".join(gzip_codec.compress(s, backend="oracle")
                      for s in spans if s)
    assert out == expect


def test_sharded_compress_small_single_shard():
    from tpz.parallel.mesh import make_mesh, sharded_compress
    from tpz.utils import corpus
    import gzip as stdgz

    data = corpus.text(5000)
    out = sharded_compress(data, make_mesh(8))
    assert stdgz.decompress(out) == data


def test_ring_all_gather_matches_ragged():
    """Ring-scheduled gather (n_dev-1 ppermute hops) produces the same
    ordered stream as the all_gather-based ragged gather."""
    from tpz.parallel import mesh as pm

    m = pm.make_mesh(8)
    rng = np.random.default_rng(5)
    cap = 192
    sizes = rng.integers(0, cap + 1, size=8).astype(np.int32)
    pay = np.zeros((8, cap), np.uint8)
    for d in range(8):
        pay[d, :sizes[d]] = rng.integers(0, 256, sizes[d], dtype=np.uint8)
    ref, total_ref = pm.ragged_all_gather(m, jnp.asarray(pay),
                                          jnp.asarray(sizes))
    out, total = pm.ring_all_gather(m, jnp.asarray(pay),
                                    jnp.asarray(sizes))
    assert int(total) == int(total_ref) == int(sizes.sum())
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_bzip2_interop_and_identity():
    """Round-4 (VERDICT r3 item 8): bzip2 sharded over the mesh — one
    independent stream per RLE1 block, so the multi-stream output is
    byte-identical across EVERY mesh size; bz2 and our decoder accept
    the concatenation."""
    import bz2

    from tpz.codecs import bzip2 as bz_codec
    from tpz.parallel.mesh import make_mesh, sharded_compress_bzip2
    from tpz.utils import corpus

    data = bytes(corpus.mixed(900_000, seed=17))
    out = sharded_compress_bzip2(data, make_mesh(8), level=1)
    assert bz2.decompress(out) == data
    assert bz_codec.decompress(out) == data

    one = sharded_compress_bzip2(data, make_mesh(1), level=1)
    assert one == out, "mesh(8) != mesh(1): sharding changed the bytes"
    four = sharded_compress_bzip2(data, make_mesh(4), level=1)
    assert four == out


def test_sharded_bzip2_level9_identity():
    """The level-9 path (900k blocks) on >= 2 MiB: mesh(8) output is
    byte-identical to mesh(1) and bz2-interoperable (VERDICT r3 item 8's
    realistic level/size)."""
    import bz2

    from tpz.parallel.mesh import make_mesh, sharded_compress_bzip2
    from tpz.utils import corpus

    data = bytes(corpus.mixed(2 << 20, seed=23))
    out = sharded_compress_bzip2(data, make_mesh(8), level=9)
    assert bz2.decompress(out) == data
    one = sharded_compress_bzip2(data, make_mesh(1), level=9)
    assert one == out
