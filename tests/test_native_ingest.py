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


def _np_merge_oracle(vals, counts):
    av = np.concatenate(vals) if vals else np.empty(0, np.uint64)
    ac = np.concatenate(counts) if counts else np.empty(0, np.int64)
    ev, inv = np.unique(av, return_inverse=True)
    ec = np.zeros(ev.shape[0], np.int64)
    if av.shape[0]:
        np.add.at(ec, inv, ac)
    return ev, ec


def test_merge_unique_matches_oracle():
    from orion_kmer_tpu.ingest import native

    if not native.available():
        pytest.skip("native ingest unavailable")
    rng = np.random.default_rng(13)
    for _ in range(100):
        n1, n2 = rng.integers(0, 60, size=2)
        v1 = np.unique(rng.integers(0, 80, size=n1, dtype=np.uint64))
        v2 = np.unique(rng.integers(0, 80, size=n2, dtype=np.uint64))
        c1 = rng.integers(1, 9, size=v1.shape[0]).astype(np.int64)
        c2 = rng.integers(1, 9, size=v2.shape[0]).astype(np.int64)
        gv, gc = native.merge_unique(v1, c1, v2, c2)
        ev, ec = _np_merge_oracle([v1, v2], [c1, c2])
        np.testing.assert_array_equal(gv, ev)
        np.testing.assert_array_equal(gc, ec)
    # u64 extremes and large counts survive
    gv, gc = native.merge_unique(
        np.array([0, 2**63, 2**64 - 1], np.uint64),
        np.array([1, 2**61, 5], np.int64),
        np.array([2**63], np.uint64),
        np.array([2**61], np.int64),
    )
    assert gv.tolist() == [0, 2**63, 2**64 - 1]
    assert gc.tolist() == [1, 2**62, 5]


def test_merge_unique_kway_matches_oracle():
    from orion_kmer_tpu.ingest import native

    if not native.available():
        pytest.skip("native ingest unavailable")
    rng = np.random.default_rng(14)
    for _ in range(100):
        r = int(rng.integers(1, 9))
        vals, counts = [], []
        for _i in range(r):
            n = int(rng.integers(0, 50))
            v = np.unique(rng.integers(0, 90, size=n, dtype=np.uint64))
            vals.append(v)
            counts.append(rng.integers(1, 9, size=v.shape[0]).astype(np.int64))
        gv, gc = native.merge_unique_kway(vals, counts)
        ev, ec = _np_merge_oracle(vals, counts)
        np.testing.assert_array_equal(gv, ev)
        np.testing.assert_array_equal(gc, ec)
    # all-heads-at-u64-max edge (the min-scan sentinel value is a legal key)
    gv, gc = native.merge_unique_kway(
        [np.array([2**64 - 1], np.uint64)] * 3 + [np.array([5], np.uint64)],
        [np.array([3], np.int64), np.array([4], np.int64), np.array([6], np.int64),
         np.array([1], np.int64)],
    )
    assert gv.tolist() == [5, 2**64 - 1]
    assert gc.tolist() == [1, 13]


def test_count_accumulator_native_vs_fallback(monkeypatch):
    """CountAccumulator end-to-end: the native k-way path and the numpy
    pairwise fallback must agree exactly (overlapping runs force count
    summation across more than two runs at once)."""
    from orion_kmer_tpu.engine import CountAccumulator
    from orion_kmer_tpu.ingest import native

    if not native.available():
        pytest.skip("native ingest unavailable")
    rng = np.random.default_rng(15)
    runs = []
    base = np.unique(rng.integers(0, 5000, size=3000, dtype=np.uint64))
    for _ in range(6):
        v = np.unique(
            np.concatenate(
                [
                    rng.choice(base, size=800, replace=False),
                    rng.integers(0, 1 << 62, size=500, dtype=np.uint64),
                ]
            )
        )
        runs.append((v, rng.integers(1, 9, size=v.shape[0]).astype(np.int64)))

    def feed():
        acc = CountAccumulator()
        for v, c in runs:
            acc.add(v, c)
        return acc.result()

    v_native, c_native = feed()
    monkeypatch.setattr(native, "available", lambda: False)
    v_np, c_np = feed()
    np.testing.assert_array_equal(v_native, v_np)
    np.testing.assert_array_equal(c_native, c_np)


def test_counts_tsv_native_matches_python(tmp_path, monkeypatch):
    """The native TSV renderer must be byte-identical to the Python
    codec.u64s_to_seqs path across k extremes and count magnitudes."""
    from orion_kmer_tpu.commands.count import write_counts_tsv
    from orion_kmer_tpu.ingest import native

    if not native.available():
        pytest.skip("native ingest unavailable")
    rng = np.random.default_rng(21)
    for k in (1, 21, 32):
        n = 3000
        vals = np.sort(
            rng.integers(0, 1 << min(2 * k, 63), size=n, dtype=np.uint64)
        )
        counts = np.concatenate(
            [
                rng.integers(1, 10, size=n - 3),
                np.array([255, 70000, 5_000_000_000]),
            ]
        ).astype(np.int64)
        pn = tmp_path / f"n{k}.tsv"
        pp = tmp_path / f"p{k}.tsv"
        write_counts_tsv(pn, vals, counts, k)
        monkeypatch.setattr(native, "available", lambda: False)
        write_counts_tsv(pp, vals, counts, k)
        monkeypatch.undo()
        assert pn.read_bytes() == pp.read_bytes()


def test_counts_tsv_rejects_nonpositive_count():
    """A count <= 0 is table corruption (pipeline counts are >= 1 by
    construction): the renderer must fail loudly (OKT_BADCOUNT), not
    serialize a fabricated line."""
    from orion_kmer_tpu.ingest import native

    if not native.available():
        pytest.skip("native ingest unavailable")
    vals = np.array([3, 7], dtype=np.uint64)
    counts = np.array([2, 0], dtype=np.int64)
    with pytest.raises(native.NativeParseError) as ei:
        native.counts_tsv_bytes(vals, counts, 4)
    assert "non-positive count" in str(ei.value)
