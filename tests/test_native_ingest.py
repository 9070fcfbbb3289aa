"""Native C++ tokenizer parity vs the pure-Python parser."""

import numpy as np
import pytest

from orion_kmer_tpu import codec
from orion_kmer_tpu.ingest import native
from orion_kmer_tpu.ingest.fastx import parse_fastx_bytes

from .util import SAMPLE1_FASTA, SAMPLE2_FASTQ, TEST_INPUT1_FASTA, TEST_INPUT2_FASTQ

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest not built"
)


def python_packed(data: bytes, k: int, normalize: bool):
    """Reference layout built from the Python parser."""
    parts, ends, ids = [], [], []
    pos = 0
    sep = np.full(k - 1, codec.INVALID_CODE, dtype=np.uint8)
    for rec in parse_fastx_bytes(data):
        ids.append(rec.id)
        c = codec.seq_to_codes(rec.seq, normalize=normalize)
        parts.append(c)
        pos += len(c)
        ends.append(pos)
        parts.append(sep)
        pos += k - 1
    return np.concatenate(parts), np.array(ends, dtype=np.int64), ids


@pytest.mark.parametrize("k", [1, 4, 21])
@pytest.mark.parametrize("normalize", [True, False])
@pytest.mark.parametrize(
    "content",
    [SAMPLE1_FASTA, SAMPLE2_FASTQ, TEST_INPUT1_FASTA, TEST_INPUT2_FASTQ],
    ids=["sample1.fa", "sample2.fq", "input1.fa", "input2.fq"],
)
def test_native_matches_python(content, normalize, k):
    data = content.encode()
    codes_n, ends_n, ids_n = native.parse_fastx_packed(data, k, normalize)
    codes_p, ends_p, ids_p = python_packed(data, k, normalize)
    assert ids_n == ids_p
    np.testing.assert_array_equal(ends_n, ends_p)
    np.testing.assert_array_equal(codes_n, codes_p)


def test_native_crlf():
    data = b">r1\r\nACGT\r\nGGTT\r\n>r2\r\nTTAA\r\n"
    codes, ends, ids = native.parse_fastx_packed(data, 3, True)
    codes_p, ends_p, ids_p = python_packed(data, 3, True)
    assert ids == ids_p
    np.testing.assert_array_equal(codes, codes_p)


def test_native_u_normalization():
    codes, _, _ = native.parse_fastx_packed(b">r\nACGU\n", 2, True)
    assert codes[:4].tolist() == [0, 1, 2, 3]
    codes, _, _ = native.parse_fastx_packed(b">r\nACGU\n", 2, False)
    assert codes[3] == codec.INVALID_CODE


def test_native_empty_errors():
    with pytest.raises(native.NativeParseError):
        native.parse_fastx_packed(b"", 4, True)
    with pytest.raises(native.NativeParseError):
        native.parse_fastx_packed(b"   \n  \n", 4, True)


def test_native_unknown_format():
    with pytest.raises(native.NativeParseError):
        native.parse_fastx_packed(b"not fasta\nACGT\n", 4, True)


def test_native_malformed_fastq():
    with pytest.raises(native.NativeParseError):
        native.parse_fastx_packed(b"@r1\nACGT\nBAD\n!!!!\n", 4, True)
    with pytest.raises(native.NativeParseError):
        native.parse_fastx_packed(b"@r1\nACGT\n+\n!!\n", 4, True)  # qual len


def test_native_headers_only_fasta():
    codes, ends, ids = native.parse_fastx_packed(b">h1\n>h2\n", 5, True)
    assert ids == [b"h1", b"h2"]
    assert ends.tolist() == [0, 4]  # zero-length records, sep between


def test_native_large_random_roundtrip():
    rng = np.random.default_rng(0)
    recs = []
    for i in range(200):
        seq = "".join(rng.choice(list("ACGTNacgtn"), size=int(rng.integers(0, 400))))
        recs.append(f">rec{i} desc {i}\n{seq}\n")
    data = "".join(recs).encode()
    k = 13
    codes_n, ends_n, ids_n = native.parse_fastx_packed(data, k, True)
    codes_p, ends_p, ids_p = python_packed(data, k, True)
    assert ids_n == ids_p
    np.testing.assert_array_equal(codes_n, codes_p)
    np.testing.assert_array_equal(ends_n, ends_p)


def test_pack_wire_matches_numpy_path():
    from orion_kmer_tpu.ingest import native

    if not native.available():
        pytest.skip("native ingest unavailable")
    import orion_kmer_tpu.engine as eng

    rng = np.random.default_rng(9)
    for n, size in [(0, 32), (1, 32), (31, 64), (4096, 4096), (1000, 2048)]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        if n:
            codes[rng.random(n) < 0.1] = 255
        got_lanes, got_inv = native.pack_wire(codes, size)
        # reference numpy path
        codes_p = eng._pad(codes, size, 255)
        invalid = codes_p > 3
        c = np.where(invalid, 0, codes_p).astype(np.uint32).reshape(-1, 16)
        lanes = np.zeros(size // 16, dtype=np.uint32)
        for j in range(16):
            lanes |= c[:, j] << np.uint32(2 * j)
        inv_words = np.packbits(invalid, bitorder="little").view(np.uint32)
        np.testing.assert_array_equal(got_lanes, lanes)
        np.testing.assert_array_equal(got_inv, inv_words)
