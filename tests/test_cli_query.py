"""Port of the reference query integration suite (tests/query_tests.rs)."""

from .util import build_db, run_cli, write_file

DB_FASTA = ">ref_genome_segment\nACGTACGTTTGCATC\n"
# k=4 canonical DB set (query_tests.rs:94-97):
# {ACGT, CGTA, GTAC, CGTT, GTTT->AAAC, TTGC->GCAA, TGCA, GCAT} (8 k-mers)

QUERY_FASTQ = (
    "@read1_match_many\nACGTACGTTT\n+\n!!!!!!!!!!\n"
    "@read2_match_one\nTTGCXXXXXX\n+\n!!!!!!!!!!\n"
    "@read3_no_match\nCCCCCCCCCC\n+\n!!!!!!!!!!\n"
    "@read4_match_kmer_short_read\nACG\n+\n!!!\n"
    "@read5_match_multiple_hits_but_one_kmer\nACGTACGTACGT\n+\n!!!!!!!!!!!!\n"
)
# hits (query_tests.rs:121-125): read1=7, read2=1, read3=0, read4 too short, read5=9


def run_query(tmp_path, db_path, reads_content, min_hits=None, out_name="ids.txt"):
    reads = write_file(tmp_path / "query_reads.fastq", reads_content)
    out = tmp_path / out_name
    argv = ["query", "-d", db_path, "-r", reads, "-o", out]
    if min_hits is not None:
        argv += ["-c", min_hits]
    rc = run_cli(*argv)
    return rc, out


def ids(out):
    return set(out.read_text().splitlines())


def test_query_basic_matches(tmp_path):
    db = build_db(tmp_path, 4, [("db.fa", DB_FASTA)])
    rc, out = run_query(tmp_path, db, QUERY_FASTQ)
    assert rc == 0
    assert ids(out) == {
        "read1_match_many",
        "read2_match_one",
        "read5_match_multiple_hits_but_one_kmer",
    }


def test_query_min_hits_filter(tmp_path):
    db = build_db(tmp_path, 4, [("db.fa", DB_FASTA)])
    rc, out = run_query(tmp_path, db, QUERY_FASTQ, min_hits=2)
    assert ids(out) == {
        "read1_match_many",
        "read5_match_multiple_hits_but_one_kmer",
    }
    rc, out = run_query(tmp_path, db, QUERY_FASTQ, min_hits=8, out_name="o8.txt")
    assert ids(out) == {"read5_match_multiple_hits_but_one_kmer"}
    rc, out = run_query(tmp_path, db, QUERY_FASTQ, min_hits=10, out_name="o10.txt")
    assert ids(out) == set()


def test_query_output_preserves_input_order(tmp_path):
    db = build_db(tmp_path, 4, [("db.fa", DB_FASTA)])
    rc, out = run_query(tmp_path, db, QUERY_FASTQ)
    lines = out.read_text().splitlines()
    assert lines == [
        "read1_match_many",
        "read2_match_one",
        "read5_match_multiple_hits_but_one_kmer",
    ]


def test_query_empty_reads_file(tmp_path, capsys):
    db = build_db(tmp_path, 4, [("db.fa", DB_FASTA)])
    empty = tmp_path / "empty.fastq"
    empty.write_bytes(b"")
    rc = run_cli("query", "-d", db, "-r", empty, "-o", tmp_path / "o")
    assert rc == 1
    assert "Failed to open or parse FASTQ file" in capsys.readouterr().err


def test_query_db_file_not_found(tmp_path, capsys):
    reads = write_file(tmp_path / "r.fastq", QUERY_FASTQ)
    rc = run_cli("query", "-d", "nonexistent.db", "-r", reads, "-o", tmp_path / "o")
    assert rc == 1
    err = capsys.readouterr().err
    assert "nonexistent.db" in err
    assert "k-mer database" in err


def test_query_reads_file_not_found(tmp_path, capsys):
    db = build_db(tmp_path, 4, [("db.fa", DB_FASTA)])
    rc = run_cli("query", "-d", db, "-r", "nonexistent.fastq", "-o", tmp_path / "o")
    assert rc == 1
    err = capsys.readouterr().err
    assert "nonexistent.fastq" in err


def test_query_gz_reads_and_output(tmp_path):
    db = build_db(tmp_path, 4, [("db.fa", DB_FASTA)])
    reads = write_file(tmp_path / "reads.fastq.gz", QUERY_FASTQ)
    out = tmp_path / "ids.txt.gz"
    rc = run_cli("query", "-d", db, "-r", reads, "-o", out)
    assert rc == 0
    import gzip

    got = set(gzip.decompress(out.read_bytes()).decode().splitlines())
    assert got == {
        "read1_match_many",
        "read2_match_one",
        "read5_match_multiple_hits_but_one_kmer",
    }


def test_query_raw_bytes_not_normalized(tmp_path):
    # query.rs:80-81: raw read bytes -- 'U' is not treated as 'T' here,
    # while build normalizes U->T.
    db = build_db(tmp_path, 4, [("db.fa", ">r\nACGTAAAA\n")])
    reads = (
        "@u_read\nACGU\n+\n!!!!\n"  # raw: U invalid -> no windows -> no hit
        "@t_read\nACGT\n+\n!!!!\n"
    )
    rc, out = run_query(tmp_path, db, reads)
    assert ids(out) == {"t_read"}
