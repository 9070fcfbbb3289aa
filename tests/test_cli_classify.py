"""Port of the reference classify integration suite (tests/classify_tests.rs)."""

import json

from .util import build_db, run_cli, write_file

INPUT_FASTA_BASIC = (
    ">input_seq1\nACGTACGT\n>input_seq2\nACGTACGT\n>input_seq3\nTTTTGGGG\n"
)
DB1_REF1 = ">db1_refA\nACGTACGTACGT\n"  # k=4: {ACGT, CGTA, GTAC}
DB1_REF2 = ">db1_refB\nGGGAAAAATTTT\n"  # k=4: {GGGA, TTCC, TTTC, AAAA, ATTT, AATT}
DB2_REF1 = ">db2_refC\nACGTTACGTT\n"  # k=4: {ACGT, CGTT, AAAC, GTAA, CGTA}


def run_classify(
    tmp_path,
    input_content,
    input_name,
    db_paths,
    k=None,
    min_freq=None,
    min_cov=None,
    tsv=None,
):
    inp = write_file(tmp_path / input_name, input_content)
    out = tmp_path / (input_name + ".json")
    argv = ["classify", "-i", inp, "-o", out]
    for d in db_paths:
        argv += ["-d", d]
    if k is not None:
        argv += ["--kmer-size", k]
    if min_freq is not None:
        argv += ["--min-kmer-frequency", min_freq]
    if min_cov is not None:
        argv += ["--min-coverage", min_cov]
    if tsv is not None:
        argv += ["--output-tsv", tsv]
    rc = run_cli(*argv)
    assert rc == 0
    return json.loads(out.read_text())


def find_ref(db_result, name):
    return next(r for r in db_result["references"] if r["reference_name"] == name)


def test_classify_basic_fasta_input(tmp_path):
    # classify_tests.rs:131-373 [rust-golden, "Corrected" values]
    k = 4
    db1 = build_db(
        tmp_path,
        k,
        [("db1_refA.fa", DB1_REF1), ("db1_refB.fa", DB1_REF2)],
        out_name="db1.db",
    )
    db2 = build_db(tmp_path, k, [("db2_refC.fa", DB2_REF1)], out_name="db2.db")

    results = run_classify(tmp_path, INPUT_FASTA_BASIC, "input.fa", [db1, db2], k=k)

    assert results["input_file_path"].endswith("input.fa")
    # input uniques: {ACGT:4, CGTA:4, GTAC:2, AAAA:1, CAAA:1, CCAA:1, CCCA:1, CCCC:1}
    assert results["total_unique_kmers_in_input"] == 8
    assert results["min_kmer_frequency_filter"] == 1
    assert len(results["databases_analyzed"]) == 2

    db1_res = results["databases_analyzed"][0]
    assert db1_res["database_path"] == str(db1)
    assert db1_res["database_kmer_size"] == k
    assert db1_res["total_unique_kmers_in_db_across_references"] == 9
    assert db1_res["overall_input_kmers_matched_in_db"] == 4
    assert db1_res["overall_sum_depth_of_matched_kmers_in_input"] == 11
    assert abs(db1_res["overall_avg_depth_of_matched_kmers_in_input"] - 11 / 4) < 1e-6
    assert abs(db1_res["proportion_input_kmers_in_db_overall"] - 4 / 8) < 1e-6
    assert abs(db1_res["proportion_db_kmers_covered_overall"] - 4 / 9) < 1e-6
    assert len(db1_res["references"]) == 2

    refa = find_ref(db1_res, "db1_refA.fa")
    assert refa["total_kmers_in_reference"] == 3
    assert refa["input_kmers_hitting_reference"] == 3
    assert refa["sum_depth_of_matched_kmers_in_input"] == 10
    assert abs(refa["avg_depth_of_matched_kmers_in_input"] - 10 / 3) < 1e-6
    assert abs(refa["proportion_input_kmers_hitting_reference"] - 3 / 8) < 1e-6
    assert abs(refa["reference_breadth_of_coverage"] - 1.0) < 1e-6

    refb = find_ref(db1_res, "db1_refB.fa")
    assert refb["total_kmers_in_reference"] == 6
    assert refb["input_kmers_hitting_reference"] == 1
    assert refb["sum_depth_of_matched_kmers_in_input"] == 1
    assert abs(refb["avg_depth_of_matched_kmers_in_input"] - 1.0) < 1e-6
    assert abs(refb["proportion_input_kmers_hitting_reference"] - 1 / 8) < 1e-6
    assert abs(refb["reference_breadth_of_coverage"] - 1 / 6) < 1e-6

    db2_res = results["databases_analyzed"][1]
    assert db2_res["total_unique_kmers_in_db_across_references"] == 5
    assert db2_res["overall_input_kmers_matched_in_db"] == 2
    assert db2_res["overall_sum_depth_of_matched_kmers_in_input"] == 8
    assert abs(db2_res["overall_avg_depth_of_matched_kmers_in_input"] - 4.0) < 1e-6
    assert abs(db2_res["proportion_input_kmers_in_db_overall"] - 2 / 8) < 1e-6
    assert abs(db2_res["proportion_db_kmers_covered_overall"] - 2 / 5) < 1e-6

    refc = db2_res["references"][0]
    assert refc["reference_name"] == "db2_refC.fa"
    assert refc["total_kmers_in_reference"] == 5
    assert refc["input_kmers_hitting_reference"] == 2
    assert refc["sum_depth_of_matched_kmers_in_input"] == 8


def test_classify_min_kmer_frequency_filter(tmp_path):
    # classify_tests.rs:376-477
    k = 4
    db = build_db(tmp_path, k, [("db_ref.fa", DB1_REF1)])
    results = run_classify(
        tmp_path,
        ">S1\nACGTACGT\n>S2\nACGTGGGG\n",
        "input_simple.fa",
        [db],
        k=k,
        min_freq=2,
    )
    assert results["total_unique_kmers_in_input"] == 2  # {ACGT:3, CGTA:2}
    assert results["min_kmer_frequency_filter"] == 2
    db_res = results["databases_analyzed"][0]
    assert db_res["total_unique_kmers_in_db_across_references"] == 3
    assert db_res["overall_input_kmers_matched_in_db"] == 2
    assert db_res["overall_sum_depth_of_matched_kmers_in_input"] == 5
    ref = db_res["references"][0]
    assert ref["input_kmers_hitting_reference"] == 2
    assert ref["sum_depth_of_matched_kmers_in_input"] == 5
    assert abs(ref["proportion_input_kmers_hitting_reference"] - 1.0) < 1e-6
    assert abs(ref["reference_breadth_of_coverage"] - 2 / 3) < 1e-6


def test_classify_k_validation_error(tmp_path, capsys):
    # classify_tests.rs:480-508
    db = build_db(tmp_path, 4, [("dbk4.fa", DB1_REF1)])
    rc = run_cli(
        "classify",
        "-i",
        "dummy_input.fa",
        "-d",
        db,
        "--kmer-size",
        3,
        "-o",
        tmp_path / "o.json",
    )
    assert rc == 1
    assert (
        "User-provided k-mer size 3 does not match k-mer size 4 from database"
        in capsys.readouterr().err
    )


def test_classify_k_mismatch_between_databases(tmp_path, capsys):
    # classify_tests.rs:511-546
    db4 = build_db(tmp_path, 4, [("dbk4.fa", DB1_REF1)], out_name="k4.db")
    db3 = build_db(tmp_path, 3, [("dbk3.fa", ">seq\nACG\n")], out_name="k3.db")
    rc = run_cli(
        "classify",
        "-i",
        "dummy_input.fa",
        "-d",
        db4,
        "-d",
        db3,
        "-o",
        tmp_path / "o.json",
    )
    assert rc == 1
    assert (
        "Effective k-mer size 4 (from first database) does not match k-mer size 3 from database"
        in capsys.readouterr().err
    )


def test_classify_min_coverage_filter(tmp_path):
    # classify_tests.rs:555-626
    k = 4
    db = build_db(
        tmp_path, k, [("db_refA.fa", DB1_REF1), ("db_refB.fa", DB1_REF2)]
    )
    results = run_classify(
        tmp_path, INPUT_FASTA_BASIC, "in_cov.fa", [db], k=k, min_cov=0.5
    )
    refs = results["databases_analyzed"][0]["references"]
    assert len(refs) == 1
    assert refs[0]["reference_name"] == "db_refA.fa"
    assert abs(refs[0]["reference_breadth_of_coverage"] - 1.0) < 1e-6

    results = run_classify(
        tmp_path, INPUT_FASTA_BASIC, "in_cov_low.fa", [db], k=k, min_cov=0.1
    )
    assert len(results["databases_analyzed"][0]["references"]) == 2


def test_classify_output_tsv(tmp_path):
    # classify_tests.rs:629-739
    k = 4
    db = build_db(
        tmp_path, k, [("db_refA.fa", DB1_REF1), ("db_refB.fa", DB1_REF2)]
    )
    tsv = tmp_path / "output.tsv"
    run_classify(
        tmp_path, INPUT_FASTA_BASIC, "in_tsv.fa", [db], k=k, min_cov=0.5, tsv=tsv
    )
    assert tsv.exists()
    lines = tsv.read_text().strip().splitlines()
    header = lines[0].split("\t")
    assert header == [
        "InputFile",
        "Database",
        "Reference",
        "TotalKmersInReference",
        "InputKmersHittingReference",
        "SumDepthMatchedKmers",
        "AvgDepthMatchedKmers",
        "ProportionInputKmersHittingReference",
        "ReferenceBreadthOfCoverage",
    ]
    assert len(lines) == 2  # only db_refA passes min_coverage 0.5
    rec = lines[1].split("\t")
    assert rec[0].endswith("in_tsv.fa")
    assert rec[2] == "db_refA.fa"
    assert rec[3] == "3"
    assert rec[4] == "3"
    assert rec[5] == "10"
    assert rec[6] == "3.3333"
    assert rec[7] == "0.3750"
    assert rec[8] == "1.0000"

    tsv_all = tmp_path / "output_all.tsv"
    run_classify(
        tmp_path, INPUT_FASTA_BASIC, "in_tsv_all.fa", [db], k=k, tsv=tsv_all
    )
    lines = tsv_all.read_text().strip().splitlines()
    assert len(lines) == 3
    rec_b = next(l.split("\t") for l in lines[1:] if l.split("\t")[2] == "db_refB.fa")
    assert rec_b[3] == "6"
    assert rec_b[4] == "1"
    assert rec_b[5] == "1"
    assert rec_b[6] == "1.0000"
    assert rec_b[7] == f"{1/8:.4f}"
    assert rec_b[8] == f"{1/6:.4f}"


def test_classify_references_sorted(tmp_path):
    # deterministic superset: references in sorted-name order (SURVEY 3.5)
    k = 4
    db = build_db(
        tmp_path,
        k,
        [("zz.fa", DB1_REF1), ("aa.fa", DB1_REF2), ("mm.fa", DB2_REF1)],
    )
    results = run_classify(tmp_path, INPUT_FASTA_BASIC, "in_sorted.fa", [db], k=k)
    names = [r["reference_name"] for r in results["databases_analyzed"][0]["references"]]
    assert names == sorted(names)


def test_classify_single_dispatch_per_db(tmp_path, monkeypatch):
    """VERDICT round 1 #2: classify must run O(1) device joins per DB
    (all references concatenated), not one per reference."""
    import numpy as np

    from orion_kmer_tpu import engine
    from orion_kmer_tpu.ops import setops

    calls = {"n": 0}
    orig = setops.classify_join

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(setops, "classify_join", counting)

    rng = np.random.default_rng(3)
    genomes = []
    for i in range(6):
        seq = "".join(rng.choice(list("ACGT"), size=400))
        p = write_file(tmp_path / f"g{i}.fasta", f">g{i}\n{seq}\n")
        genomes.append(p)
    db = tmp_path / "many.db"
    assert run_cli("build", "-k", 11, "-g", *genomes, "-o", db) == 0
    inp = write_file(
        tmp_path / "in.fasta",
        ">r\n" + "".join(rng.choice(list("ACGT"), size=600)) + "\n",
    )
    out = tmp_path / "out.json"
    calls["n"] = 0
    assert run_cli("classify", "-i", inp, "-d", db, "-o", out) == 0
    assert calls["n"] == 1, f"expected 1 join dispatch for 6 refs, got {calls['n']}"


def test_classify_chunked_joins_match_single(tmp_path, monkeypatch):
    """Databases larger than MAX_JOIN chunk at reference boundaries; the
    output must match the single-dispatch result exactly."""
    import numpy as np

    from orion_kmer_tpu.engine import ClassifyJoiner

    rng = np.random.default_rng(8)
    genomes = []
    for i in range(5):
        seq = "".join(rng.choice(list("ACGT"), size=300))
        genomes.append(write_file(tmp_path / f"c{i}.fasta", f">c{i}\n{seq}\n"))
    db = tmp_path / "c.db"
    assert run_cli("build", "-k", 9, "-g", *genomes, "-o", db) == 0
    inp = write_file(
        tmp_path / "in.fasta",
        ">r\n" + "".join(rng.choice(list("ACGT"), size=500)) + "\n",
    )
    o1, o2 = tmp_path / "one.json", tmp_path / "many.json"
    assert run_cli("classify", "-i", inp, "-d", db, "-o", o1) == 0
    monkeypatch.setattr(ClassifyJoiner, "MAX_JOIN", 400)  # force ~4 chunks
    assert run_cli("classify", "-i", inp, "-d", db, "-o", o2) == 0
    assert o1.read_text() == o2.read_text()
