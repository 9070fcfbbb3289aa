"""Port of the reference compare integration suite (tests/compare_tests.rs)."""

import json

from .util import build_db, run_cli

FASTA_DB1 = ">seqA\nACGTACGT\n>seqB\nTTTTGGGG\n"
FASTA_DB2 = ">seqC\nACGTACGG\n>seqD\nAAAACCCC\n"


def run_compare(tmp_path, db1, db2, out_name="cmp.json"):
    out = tmp_path / out_name
    rc = run_cli("compare", "--db1", db1, "--db2", db2, "-o", out)
    return rc, out


def test_compare_basic(tmp_path):
    # compare_tests.rs:71-111 [rust-golden]
    k = 4
    db1 = build_db(tmp_path, k, [("db1.fa", FASTA_DB1)], out_name="db1.db")
    db2 = build_db(tmp_path, k, [("db2.fa", FASTA_DB2)], out_name="db2.db")
    rc, out = run_compare(tmp_path, db1, db2)
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["kmer_size"] == k
    assert data["db1_total_unique_kmers_across_references"] == 8
    assert data["db2_total_unique_kmers_across_references"] == 9
    assert data["intersection_size"] == 5
    assert data["union_size"] == 12
    assert abs(data["jaccard_index"] - 5 / 12) < 1e-6
    # full field-name surface (compare.rs:16-25)
    assert set(data) == {
        "db1_path",
        "db2_path",
        "kmer_size",
        "db1_total_unique_kmers_across_references",
        "db2_total_unique_kmers_across_references",
        "intersection_size",
        "union_size",
        "jaccard_index",
    }


def test_compare_identical_databases(tmp_path):
    # compare_tests.rs:114-148
    db = build_db(tmp_path, 3, [("identical.fa", ">s1\nACGTACGTACGT\n")])
    rc, out = run_compare(tmp_path, db, db)
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["db1_total_unique_kmers_across_references"] == 2
    assert data["intersection_size"] == 2
    assert data["union_size"] == 2
    assert abs(data["jaccard_index"] - 1.0) < 1e-6


def test_compare_partial_overlap(tmp_path):
    # compare_tests.rs:151-196 ("no_overlap" actually shares AAAAA+CCCCC)
    db1 = build_db(tmp_path, 5, [("n1.fa", ">s1\nAAAAACCCCC\n")], out_name="n1.db")
    db2 = build_db(tmp_path, 5, [("n2.fa", ">s2\nTTTTTGGGGG\n")], out_name="n2.db")
    rc, out = run_compare(tmp_path, db1, db2)
    data = json.loads(out.read_text())
    assert data["db1_total_unique_kmers_across_references"] == 6
    assert data["db2_total_unique_kmers_across_references"] == 6
    assert data["intersection_size"] == 2  # AAAAA and CCCCC
    assert data["union_size"] == 10
    assert abs(data["jaccard_index"] - 0.2) < 1e-6


def test_compare_kmer_size_mismatch(tmp_path, capsys):
    # compare_tests.rs:199-220
    db1 = build_db(tmp_path, 3, [("k3.fa", FASTA_DB1)], out_name="k3.db")
    db2 = build_db(tmp_path, 4, [("k4.fa", FASTA_DB2)], out_name="k4.db")
    rc, _ = run_compare(tmp_path, db1, db2)
    assert rc == 1
    assert (
        "K-mer databases have incompatible k-mer sizes (overall comparison): 3 vs 4"
        in capsys.readouterr().err
    )


def test_compare_empty_union_jaccard_zero(tmp_path):
    # compare.rs:62-66: 0/0 -> 0.0
    db = build_db(tmp_path, 5, [("empty.fa", ">h1\n>h2\n")])
    rc, out = run_compare(tmp_path, db, db)
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["union_size"] == 0
    assert data["jaccard_index"] == 0.0


def test_compare_db_not_found(tmp_path, capsys):
    db1 = build_db(tmp_path, 4, [("a.fa", FASTA_DB1)])
    rc, _ = run_compare(tmp_path, db1, tmp_path / "missing.db")
    assert rc == 1
    assert "missing.db" in capsys.readouterr().err


def test_compare_corrupt_db(tmp_path, capsys):
    db1 = build_db(tmp_path, 4, [("a.fa", FASTA_DB1)])
    bad = tmp_path / "corrupt.db"
    bad.write_bytes(b"\x07" + b"\xff" * 64)
    rc, _ = run_compare(tmp_path, db1, bad)
    assert rc == 1
    err = capsys.readouterr().err
    assert "corrupt.db" in err
