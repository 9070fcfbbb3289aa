"""Streaming bounded-memory ingest: chunked decompression + incremental
native parse with carried-over partial records (VERDICT round 1 #1).

The contract under test: for ANY chunk size, the concatenated chunk
stream is byte-identical to the whole-buffer parse, every yield holds
only whole records, and the carry never exceeds chunk + one record --
so ingest memory is O(chunk), never O(file)
(reference: utils.rs:125-152 + count.rs:63-79 stream, never materialize).
"""

import gzip
import os

import numpy as np
import pytest

from orion_kmer_tpu import codec
from orion_kmer_tpu.engine import stream_file_batches, stream_native_chunks
from orion_kmer_tpu.ingest import native
from orion_kmer_tpu.ingest.fastx import FastxParseError, parse_fastx_file

from .util import run_cli, write_file

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ingest unavailable"
)


def _random_fasta(rng, n_records, max_len=200):
    out = []
    for i in range(n_records):
        seq = "".join(rng.choice(list("ACGTNacgt"), size=rng.integers(0, max_len)))
        # multi-line records with random wrap width
        w = int(rng.integers(1, 80))
        lines = [seq[j : j + w] for j in range(0, len(seq), w)] or [""]
        out.append(f">rec{i} desc\n" + "\n".join(lines) + "\n")
    return "".join(out)


def _random_fastq(rng, n_records, max_len=150):
    out = []
    for i in range(n_records):
        ln = int(rng.integers(1, max_len))
        seq = "".join(rng.choice(list("ACGTN"), size=ln))
        out.append(f"@read{i}\n{seq}\n+\n{'I' * ln}\n")
    return "".join(out)


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
@pytest.mark.parametrize("chunk", [1, 7, 64, 1021, 65536])
def test_chunk_stream_equals_whole_parse(tmp_path, fmt, chunk):
    rng = np.random.default_rng(hash((fmt, chunk)) % 2**31)
    text = (
        _random_fasta(rng, 40) if fmt == "fasta" else _random_fastq(rng, 40)
    )
    p = write_file(tmp_path / f"in.{fmt}", text)
    data = text.encode()
    k = 5
    codes_w, ends_w, ids_w = native.parse_fastx_packed(data, k, True, source="w")
    parts = list(stream_native_chunks(p, k, True, chunk_bytes=chunk))
    codes_s = (
        np.concatenate([c for c, _, _ in parts])
        if parts
        else np.empty(0, np.uint8)
    )
    ids_s = [i for _, _, ii in parts for i in ii]
    np.testing.assert_array_equal(codes_s, codes_w)
    assert ids_s == ids_w
    # each yield holds only whole records and bounded data
    for c, ends, ii in parts:
        assert len(ii) == ends.shape[0]
        rec_max = int(np.diff(np.concatenate([[0], ends])).max()) if len(ii) else 0
        assert c.shape[0] <= chunk + rec_max + (k - 1) * (len(ii) + 1)


def test_chunk_stream_gz(tmp_path):
    rng = np.random.default_rng(9)
    text = _random_fastq(rng, 30)
    p = tmp_path / "r.fastq.gz"
    p.write_bytes(gzip.compress(text.encode()))
    k = 7
    whole = native.parse_fastx_packed(text.encode(), k, True, source="w")
    parts = list(stream_native_chunks(p, k, True, chunk_bytes=512))
    np.testing.assert_array_equal(
        np.concatenate([c for c, _, _ in parts]), whole[0]
    )
    assert [i for _, _, ii in parts for i in ii] == whole[2]


def test_stream_errors(tmp_path):
    # empty file
    p = write_file(tmp_path / "e.fasta", "")
    with pytest.raises(native.NativeParseError):
        list(stream_native_chunks(p, 3, True, chunk_bytes=8))
    # whitespace only
    p = write_file(tmp_path / "w.fasta", "  \n \n")
    with pytest.raises(native.NativeParseError):
        list(stream_native_chunks(p, 3, True, chunk_bytes=2))
    # unknown format
    p = write_file(tmp_path / "u.txt", "not fasta\nACGT\n")
    with pytest.raises(native.NativeParseError):
        list(stream_native_chunks(p, 3, True, chunk_bytes=4))
    # truncated FASTQ at EOF is malformed (matches whole-buffer parse)
    p = write_file(tmp_path / "t.fastq", "@r\nACGT\n+\n")
    with pytest.raises(native.NativeParseError):
        list(stream_native_chunks(p, 3, True, chunk_bytes=4))
    # trailing whitespace after real records is fine
    p = write_file(tmp_path / "ok.fasta", ">r\nACGT\n\n  \n")
    parts = list(stream_native_chunks(p, 3, True, chunk_bytes=3))
    assert [i for _, _, ii in parts for i in ii] == [b"r"]


def test_single_record_larger_than_chunk(tmp_path):
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list("ACGT"), size=10000))
    p = write_file(tmp_path / "big.fasta", f">huge\n{seq}\n")
    parts = list(stream_native_chunks(p, 31, True, chunk_bytes=256))
    assert len(parts) == 1 and parts[0][2] == [b"huge"]
    exp = codec.seq_to_codes(seq.encode())
    np.testing.assert_array_equal(parts[0][0][: len(seq)], exp)


def test_count_cli_output_invariant_to_chunking(tmp_path, monkeypatch):
    rng = np.random.default_rng(13)
    text = _random_fastq(rng, 200)
    p = write_file(tmp_path / "reads.fastq", text)
    out1 = tmp_path / "a.tsv"
    out2 = tmp_path / "b.tsv"
    assert run_cli("count", "-k", 15, "-i", p, "-o", out1) == 0
    monkeypatch.setenv("ORION_KMER_CHUNK_BYTES", "777")
    import orion_kmer_tpu.engine as engine

    monkeypatch.setattr(engine, "CHUNK_BYTES", 777)
    assert run_cli("count", "-k", 15, "-i", p, "-o", out2) == 0
    assert out1.read_text() == out2.read_text()


def test_query_output_invariant_to_chunking(tmp_path, monkeypatch):
    rng = np.random.default_rng(21)
    g = "".join(rng.choice(list("ACGT"), size=3000))
    gp = write_file(tmp_path / "g.fasta", f">g\n{g}\n")
    db = tmp_path / "g.db"
    assert run_cli("build", "-k", 11, "-g", gp, "-o", db) == 0
    reads = []
    for i in range(50):
        s = int(rng.integers(0, 2900))
        reads.append(f"@q{i}\n{g[s:s+60]}\n+\n{'I'*60}\n")
    rp = write_file(tmp_path / "r.fastq", "".join(reads))
    o1, o2 = tmp_path / "h1.txt", tmp_path / "h2.txt"
    assert run_cli("query", "-d", db, "-r", rp, "-c", 5, "-o", o1) == 0
    import orion_kmer_tpu.engine as engine

    monkeypatch.setattr(engine, "CHUNK_BYTES", 333)
    assert run_cli("query", "-d", db, "-r", rp, "-c", 5, "-o", o2) == 0
    assert o1.read_text() == o2.read_text()
    assert len(o1.read_text().splitlines()) == 50


def test_python_fallback_streams_records(tmp_path, monkeypatch):
    """The pure-Python fallback parser must stream too (O(record))."""
    text = ">a\nACGT\nACGT\n>b\nTTTT\n"
    p = write_file(tmp_path / "x.fasta", text)
    recs = list(parse_fastx_file(p))
    assert [r.id for r in recs] == [b"a desc".replace(b" desc", b""), b"b"]
    assert [r.seq for r in recs] == [b"ACGTACGT", b"TTTT"]
    # and the batch path agrees with the native path
    monkeypatch.setenv("ORION_KMER_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", False)
    batches_py = [b.codes.copy() for b in stream_file_batches(p, 3)]
    monkeypatch.setenv("ORION_KMER_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", False)
    batches_nat = [b.codes.copy() for b in stream_file_batches(p, 3)]
    np.testing.assert_array_equal(
        np.concatenate(batches_py), np.concatenate(batches_nat)
    )


def test_query_records_spanning_many_batches(tmp_path, monkeypatch):
    """A read much longer than the batch must carry through many
    batches (negative rolling starts) with exact multiplicity hits."""
    import orion_kmer_tpu.engine as engine
    from orion_kmer_tpu.db import KmerDb
    from orion_kmer_tpu.engine import query_file, unique_from_file

    rng = np.random.default_rng(71)
    g = "".join(rng.choice(list("ACGT"), size=2000))
    gp = write_file(tmp_path / "g.fasta", f">g\n{g}\n")
    k = 21
    vals = unique_from_file(gp, k)
    # reads: one long read from g (spans many 512-position batches),
    # one long random read, two short ones
    long_hit = g[100:1800]
    long_miss = "".join(rng.choice(list("ACGT"), size=1500))
    reads = (
        f"@hit\n{long_hit}\n+\n{'I'*len(long_hit)}\n"
        f"@miss\n{long_miss}\n+\n{'I'*len(long_miss)}\n"
        f"@short\n{g[50:80]}\n+\n{'I'*30}\n"
        f"@tiny\nACGT\n+\nIIII\n"
    )
    rp = write_file(tmp_path / "r.fastq", reads)
    monkeypatch.setattr(engine, "CHUNK_BYTES", 400)  # multiple chunks too

    got = query_file(vals, rp, k, min_hits=1, batch_positions=512)
    assert got == [b"hit", b"short"]
    # exact hit-threshold: the long hit read has len-k+1 matching windows
    n_windows = len(long_hit) - k + 1
    got = query_file(vals, rp, k, min_hits=n_windows, batch_positions=512)
    assert got == [b"hit"]
    got = query_file(vals, rp, k, min_hits=n_windows + 1, batch_positions=512)
    assert got == []


@pytest.mark.parametrize("ext", ["xz", "zst"])
def test_chunk_stream_compressed_matrix(tmp_path, ext):
    """Streaming chunk reads must work through every read-side codec
    (utils.rs:125-152 matrix), not just gz."""
    rng = np.random.default_rng(29)
    text = _random_fastq(rng, 25)
    p = write_file(tmp_path / f"r.fastq.{ext}", text)
    k = 7
    whole = native.parse_fastx_packed(text.encode(), k, True, source="w")
    parts = list(stream_native_chunks(p, k, True, chunk_bytes=256))
    np.testing.assert_array_equal(
        np.concatenate([c for c, _, _ in parts]), whole[0]
    )
    assert [i for _, _, ii in parts for i in ii] == whole[2]


def test_chunk_stream_multi_member_gz(tmp_path):
    """Concatenated gzip members must decompress as one stream
    (MultiGzDecoder semantics, utils.rs:131)."""
    rng = np.random.default_rng(31)
    t1 = _random_fastq(rng, 10)
    t2 = _random_fastq(rng, 10)
    p = tmp_path / "m.fastq.gz"
    p.write_bytes(gzip.compress(t1.encode()) + gzip.compress(t2.encode()))
    k = 5
    whole = native.parse_fastx_packed((t1 + t2).encode(), k, True, source="w")
    parts = list(stream_native_chunks(p, k, True, chunk_bytes=128))
    np.testing.assert_array_equal(
        np.concatenate([c for c, _, _ in parts]), whole[0]
    )
    assert len([i for _, _, ii in parts for i in ii]) == 20
