"""Device BWT + bzip2 pipeline vs oracle — differential tests."""

import bz2 as stdbz2

import numpy as np
import pytest

from tpz import oracle
from tpz.utils import corpus

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle library not built"
)


def test_device_bwt_matches_reference():
    from tpz.kernels.bwt import bwt_blocks

    cases = [
        b"banana",
        b"abracadabra",
        b"aaaa",                     # fully periodic (tie-break path)
        b"abababab",
        corpus.text(5000),
        corpus.random_bytes(3000),
        corpus.repetitive(4000),
        b"x",
    ]
    N = 8192
    nb = len(cases)
    blocks = np.zeros((nb, N), np.uint8)
    lens = np.zeros(nb, np.int64)
    for i, c in enumerate(cases):
        blocks[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    last, orig = bwt_blocks(blocks, lens)
    for i, c in enumerate(cases):
        ref_last, ref_orig = oracle.bwt_ref(c)
        assert np.array_equal(last[i, : len(c)], ref_last), f"case {i}"
        assert int(orig[i]) == ref_orig, f"case {i}: {orig[i]} != {ref_orig}"


@pytest.mark.parametrize("name,level", [
    ("text", 9), ("mixed", 9), ("repetitive", 9), ("random", 9),
    ("mixed_l1", 1),
])
def test_pipeline_matches_oracle(name, level):
    from tpz.kernels import bzip2_pipeline

    data = {
        "text": corpus.text(120_000),
        "mixed": corpus.mixed(150_000),
        "repetitive": corpus.repetitive(80_000),
        "random": corpus.random_bytes(60_000),
        "mixed_l1": corpus.mixed(250_000),   # multiple blocks at level 1
    }[name]
    ours = bzip2_pipeline.compress(data, level)
    ref = oracle.bzip2_encode(data, level)
    assert ours == ref, f"{name}: device bzip2 diverged from oracle"
    assert stdbz2.decompress(ours) == data


def test_compress_many_batched():
    """One device BWT invocation serves many buffers (VERDICT r1 #4)."""
    from tpz.kernels import bzip2_pipeline
    import bz2 as stdbz2

    datas = [corpus.mixed(300_000), b"", corpus.text(50_000),
             corpus.random_bytes(120_000)]
    blobs = bzip2_pipeline.compress_many(datas, 9)
    for d, blob in zip(datas, blobs):
        assert stdbz2.decompress(blob) == d
        assert blob == oracle.bzip2_encode(d, 9)


def test_device_ibwt_decode():
    """Device iBWT decode path: host Huffman/MTF inverse -> device
    pointer-doubling iBWT -> host RLE1 inverse + CRC (VERDICT r1 #4)."""
    from tpz.kernels import bzip2_pipeline
    import bz2 as stdbz2

    for data in (corpus.mixed(1_500_000), corpus.text(80_000),
                 corpus.repetitive(200_000), b"a"):
        blob = stdbz2.compress(data, 9)  # interop: stdlib-produced stream
        out = bzip2_pipeline.decompress(blob)
        assert out == data
        blob2 = oracle.bzip2_encode(data, 9)
        assert bzip2_pipeline.decompress(blob2) == data


def test_device_ibwt_decode_corrupt():
    import bz2 as stdbz2

    from tpz.errors import CompressionError
    from tpz.kernels import bzip2_pipeline

    blob = bytearray(stdbz2.compress(corpus.mixed(300_000), 9))
    blob[len(blob) // 2] ^= 0x40
    try:
        out = bzip2_pipeline.decompress(bytes(blob))
        assert out is None or out != b""  # scan may reject the shape...
        if out is not None:
            raise AssertionError("corruption not detected")
    except CompressionError:
        pass


def test_scan_to_last_rejects_corrupt_combined_crc():
    """ADVICE r2 medium: the device decode path must verify the EOS magic
    and combined stream CRC like both host decoders."""
    from tpz.errors import DataError

    data = corpus.text(3000)
    blob = bytearray(oracle.bzip2_encode(data, 1))
    # Byte -5 lies inside the EOS trailer (last magic byte or the combined
    # CRC, depending on bit padding); flipping it must be caught.
    blob[-5] ^= 0xFF
    with pytest.raises(DataError):
        oracle.bzip2_scan_to_last(bytes(blob))


def test_scan_to_last_multistream_falls_back():
    """Concatenated streams have a non-contiguous block layout; the
    indexed path declines (None) and the serial decoder handles them."""
    a = oracle.bzip2_encode(corpus.text(2000), 1)
    b = oracle.bzip2_encode(corpus.repetitive(2000), 1)
    assert oracle.bzip2_scan_to_last(a + b) is None


def test_device_coder_edge_shapes():
    """Full-device coder vs oracle on shapes that stress the partition
    and table-count rules: tiny streams (2 tables), full 256-symbol
    alphabets, concentrated frequencies, and multi-block buffers."""
    from tpz.kernels import bzip2_pipeline as bp

    rng = np.random.default_rng(9)
    cases = [
        b"a",                                   # alpha=3, n_mtf tiny
        b"ab" * 60,                             # n_mtf < 200 -> 2 tables
        bytes(range(256)) * 40,                 # all 256 symbols used
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),  # incompressible
        (b"\x00" * 5000) + bytes(range(256)),   # concentrated freq
        corpus.mixed(300_000, seed=77),         # multi-group, 6 tables
    ]
    for level in (1, 9):
        ours = bp.compress_many(cases, level)
        for d, o in zip(cases, ours):
            ref = oracle.bzip2_encode(d, level)
            assert o == ref, (level, len(d))


def test_assemble_mtf_alternative_route():
    """The native-runtime assembly entry (cpp Bzip2AssembleMtf): encode
    from an externally produced MTF/RLE2 symbol stream — here the device
    front half's — and land byte-identical to the all-device and oracle
    encoders. Keeps the C ABI surface a native caller would use under
    differential coverage."""
    from tpz.kernels import bzip2_pipeline as bp

    data = corpus.mixed(260_000, seed=33)
    level = 1
    rle, off, ln, crc = oracle.bzip2_rle1(data, level)
    nb = off.size
    N = bp._bucket(int(ln.max()))
    blocks = np.zeros((nb, N), np.uint8)
    for b in range(nb):
        blocks[b, : ln[b]] = rle[off[b]:off[b] + ln[b]]
    orig, syms, sym_len, used, n_used = bp.bwt_mtf_rle2_blocks(
        blocks, ln.astype(np.int64))
    lens_out = sym_len.astype(np.int64) + 1
    off2 = np.cumsum(lens_out) - lens_out
    flat = np.zeros(int(lens_out.sum()), np.uint16)
    for b in range(nb):
        sl = int(sym_len[b])
        flat[off2[b]:off2[b] + sl] = syms[b, :sl].astype(np.uint16)
        flat[off2[b] + sl] = n_used[b] + 1
    out = oracle.bzip2_assemble_mtf(
        flat, off2, lens_out.astype(np.int32), used.astype(np.uint8),
        crc, orig.astype(np.uint32), level)
    assert out == oracle.bzip2_encode(data, level)
