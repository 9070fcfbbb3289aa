"""Port of the reference build integration suite (tests/build_tests.rs).

DB artifacts are deserialized with the bincode-compatible loader and
compared against expected sets built through the codec, mirroring
build_tests.rs:116-120.  Goldens recomputed where the reference's were
drifted (its k=5/k=6 expected-set helpers pass 6-char strings to a k=5
encoder, which unwraps None and can never have passed).
"""

import numpy as np
import pytest

from orion_kmer_tpu import codec
from orion_kmer_tpu.db import KmerDb

from .util import (
    SAMPLE1_FASTA,
    TEST_INPUT1_FASTA,
    TEST_INPUT2_FASTQ,
    kmers_from_strings,
    run_cli,
    write_file,
)

MINI_FASTA = ">s1\nACGT\n>s2\nACGT\n"


def run_build(tmp_path, k, files, out_name="test.db"):
    paths = [write_file(tmp_path / name, content) for name, content in files]
    db_path = tmp_path / out_name
    rc = run_cli("build", "-k", k, "-o", db_path, "-g", *paths)
    assert rc == 0
    return db_path


def test_build_simple_fasta_k3(tmp_path):
    # build_tests.rs:127-150
    db = KmerDb.load(run_build(tmp_path, 3, [("sample1.fasta", SAMPLE1_FASTA)]))
    assert db.k == 3
    assert db.num_references() == 1
    assert "sample1.fasta" in db.references
    expected = kmers_from_strings(
        ["AAA", "AAC", "ACC", "ACG", "AGC", "CCC", "CCG", "CTA", "GAA", "GGA", "GTA"], 3
    )
    assert set(db.references["sample1.fasta"].tolist()) == expected
    assert db.total_unique_kmers() == 11


def test_build_duplicate_kmers_k4(tmp_path):
    # build_tests.rs:153-164
    db = KmerDb.load(run_build(tmp_path, 4, [("mini.fasta", MINI_FASTA)]))
    assert db.k == 4
    assert set(db.references["mini.fasta"].tolist()) == kmers_from_strings(["ACGT"], 4)
    assert db.total_unique_kmers() == 1


def test_build_multiple_files_k4(tmp_path):
    # build_tests.rs:167-209
    db = KmerDb.load(
        run_build(
            tmp_path,
            4,
            [("s1.fa", ">s1\nACGTACGT\n"), ("s2.fa", ">s2\nTACGTACG\n"), ("s3.fa", ">s3\nGGGATCCC\n")],
        )
    )
    assert db.num_references() == 3
    exp_s1 = kmers_from_strings(["ACGT", "CGTA", "GTAC"], 4)
    exp_s3 = kmers_from_strings(["GGGA", "GGAT", "GATC", "ATCC", "TCCC"], 4)
    assert set(db.references["s1.fa"].tolist()) == exp_s1
    assert set(db.references["s2.fa"].tolist()) == exp_s1
    assert set(db.references["s3.fa"].tolist()) == exp_s3
    assert set(db.get_all_kmers_unified().tolist()) == exp_s1 | exp_s3


def test_build_0_byte_empty_file(tmp_path, capsys):
    # build_tests.rs:212-237
    empty = tmp_path / "empty.fa"
    empty.write_bytes(b"")
    rc = run_cli("build", "-k", 5, "-g", empty, "-o", tmp_path / "o.db")
    assert rc == 1
    assert "Failed to open or parse FASTA/Q file" in capsys.readouterr().err


def test_build_fasta_with_no_sequences(tmp_path):
    # build_tests.rs:240-251: headers-only FASTA -> empty reference set
    db = KmerDb.load(run_build(tmp_path, 5, [("no_seq.fa", ">header1\n>header2\n")]))
    assert db.k == 5
    assert db.num_references() == 1
    assert db.references["no_seq.fa"].shape[0] == 0
    assert db.total_unique_kmers() == 0


def test_build_malformed_fasta(tmp_path, capsys):
    # build_tests.rs:254-279
    bad = tmp_path / "malformed.fa"
    bad.write_bytes(b"This is not fasta content\nACGT")
    rc = run_cli("build", "-k", 3, "-g", bad, "-o", tmp_path / "o.db")
    assert rc == 1
    assert "Failed to open or parse FASTA/Q file" in capsys.readouterr().err


def test_build_invalid_k(tmp_path, capsys):
    f = write_file(tmp_path / "d.fa", ">d\nACGT\n")
    rc = run_cli("build", "-k", 33, "-g", f, "-o", tmp_path / "o.db")
    assert rc == 1
    assert "Invalid K-mer size: 33" in capsys.readouterr().err


def test_build_file_not_found(tmp_path, capsys):
    rc = run_cli("build", "-k", 5, "-g", "nonexistent_file.fasta", "-o", tmp_path / "o.db")
    assert rc == 1
    err = capsys.readouterr().err
    assert "Failed to open or parse FASTA/Q file" in err
    assert "nonexistent_file.fasta" in err


# --- compressed I/O (build_tests.rs:322-459) ---

# [recomputed] k=7 canonical set of the shipped test_input1.fasta --
# build_tests.rs:334 lists TACGTAC although rc(TACGTAC)=GTACGTA < TACGTAC,
# and omits seq2's k-mers entirely (written for an older fixture).
def expected_input1_k7():
    return kmers_from_strings(
        ["ACGTACG", "GTACGTA", "GCATGCA", "ATGCATG", "GATTACA"], 7
    )


# [recomputed] k=6 canonical set of the shipped test_input2.fastq
def expected_input2_k6():
    return kmers_from_strings(
        ["CGTACG", "ACGTAC", "TACGTA", "GCATGC", "CATGCA", "ATGCAT", "GATTAC", "ATTACA"],
        6,
    )


@pytest.mark.parametrize("ext", ["", ".gz", ".xz", ".zst"])
def test_build_input1_compression_matrix_k7(tmp_path, ext):
    name = f"test_input1.fasta{ext}"
    db = KmerDb.load(run_build(tmp_path, 7, [(name, TEST_INPUT1_FASTA)]))
    assert db.k == 7
    # reference name = basename INCLUDING compression extension (build.rs:106-109)
    assert set(db.references[name].tolist()) == expected_input1_k7()


def test_build_gz_output(tmp_path):
    name = "test_input2.fastq.gz"
    db = KmerDb.load(
        run_build(tmp_path, 6, [(name, TEST_INPUT2_FASTQ)], out_name="out.db.gz")
    )
    assert db.k == 6
    assert set(db.references[name].tolist()) == expected_input2_k6()


def test_build_multiple_compressed_inputs_k5(tmp_path):
    # [recomputed] build_tests.rs:419-458's expected sets contain 6-char
    # strings for k=5 (GATTAC, ATTACA) -- they would panic in the Rust
    # helper.  Derived via the oracle instead.
    def oracle_set(seqs, k):
        out = set()
        for s in seqs:
            out |= set(codec.extract_kmers_np(codec.seq_to_codes(s), k).tolist())
        return out

    exp1 = oracle_set(
        [b"ACGTACGTACGT", b"TGCATGCATGCANNNACGT", b"GATTACANNNNNGATTACA"], 5
    )
    exp2 = oracle_set([b"CGTACGTACG", b"GCATGCATGC", b"GATTACANNN"], 5)

    db = KmerDb.load(
        run_build(
            tmp_path,
            5,
            [
                ("test_input1.fasta.xz", TEST_INPUT1_FASTA),
                ("test_input2.fastq.zst", TEST_INPUT2_FASTQ),
            ],
        )
    )
    assert db.num_references() == 2
    assert set(db.references["test_input1.fasta.xz"].tolist()) == exp1
    assert set(db.references["test_input2.fastq.zst"].tolist()) == exp2
    assert db.total_unique_kmers() == len(exp1 | exp2)


def test_db_bincode_roundtrip(tmp_path):
    # byte-level: serialize -> parse -> identical model
    db = KmerDb(k=9)
    rng = np.random.default_rng(0)
    db.add_reference("a.fa", rng.integers(0, 2**62, size=100, dtype=np.uint64))
    db.add_reference("b.fa", rng.integers(0, 2**62, size=50, dtype=np.uint64))
    blob = db.to_bincode()
    db2 = KmerDb.from_bincode(blob)
    assert db2.k == 9
    assert set(db2.references) == {"a.fa", "b.fa"}
    for name in db.references:
        np.testing.assert_array_equal(db.references[name], db2.references[name])


def test_db_bincode_layout():
    # bincode 1.3 fixint little-endian layout (build.rs:141, KmerDbV2)
    db = KmerDb(k=4)
    db.add_reference("ab", np.array([1, 2], dtype=np.uint64))
    blob = db.to_bincode()
    expected = (
        bytes([4])  # k: u8
        + (1).to_bytes(8, "little")  # map len
        + (2).to_bytes(8, "little")  # name len
        + b"ab"
        + (2).to_bytes(8, "little")  # set len
        + (1).to_bytes(8, "little")
        + (2).to_bytes(8, "little")
    )
    assert blob == expected


def test_db_add_reference_overwrites():
    # db_types.rs:38-40: re-adding a name overwrites
    db = KmerDb(k=4)
    db.add_reference("x", np.array([1, 2, 3], dtype=np.uint64))
    db.add_reference("x", np.array([9], dtype=np.uint64))
    assert db.references["x"].tolist() == [9]
    assert db.total_unique_kmers() == 1


def test_db_bincode_layout_multi_ref():
    """Byte-equality of to_bincode for a MULTI-reference DB against a
    blob constructed independently from serde/bincode-1.3's documented
    fixint-LE layout (KmerDbV2: u8 k, u64 map len, then per entry u64
    name len + UTF-8 bytes + u64 set len + u64 values; build.rs:141,
    db_types.rs:8-14).  Also: a blob with entries in a DIFFERENT order
    (Rust HashMap order is arbitrary) must load to the same database."""
    db = KmerDb(k=31)
    db.add_reference("genome_a.fasta.gz", np.array([0, 5, 2**63], dtype=np.uint64))
    db.add_reference("b.fa", np.array([7], dtype=np.uint64))
    db.add_reference("empty.fna", np.empty(0, dtype=np.uint64))
    blob = db.to_bincode()

    def entry(name: str, vals):
        out = len(name.encode()).to_bytes(8, "little") + name.encode()
        out += len(vals).to_bytes(8, "little")
        for v in vals:
            out += int(v).to_bytes(8, "little")
        return out

    expected = (
        bytes([31])
        + (3).to_bytes(8, "little")
        + entry("genome_a.fasta.gz", [0, 5, 2**63])
        + entry("b.fa", [7])
        + entry("empty.fna", [])
    )
    assert blob == expected

    # order-independence on load (HashMap iteration order is arbitrary)
    reordered = (
        bytes([31])
        + (3).to_bytes(8, "little")
        + entry("empty.fna", [])
        + entry("b.fa", [7])
        + entry("genome_a.fasta.gz", [0, 5, 2**63])
    )
    db2 = KmerDb.from_bincode(reordered)
    assert db2.k == db.k
    assert set(db2.references) == set(db.references)
    for name in db.references:
        np.testing.assert_array_equal(db2.references[name], db.references[name])
    # unordered set values must also load (HashSet order is arbitrary)
    shuffled = bytes([31]) + (1).to_bytes(8, "little") + entry("x", [9, 3, 6])
    db3 = KmerDb.from_bincode(shuffled)
    assert db3.references["x"].tolist() == [3, 6, 9]  # stored sorted
