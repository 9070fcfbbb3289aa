"""Size-boundary crossings through the full CLI (VERDICT r4 item 5).

Production-scale seams, forced in CI by lowering the bounds in-test:

  * count spilling past DEVICE_TABLE_MAX mid-run, so the host-tier
    accumulator path runs through the CLI (single-chip AND sharded),
    on every key route (single-plane / u48 / pair)
  * a query DB and read set crossing the device bucket minimums
    (_MIN_BUCKET / _READS_BUCKET = 4096), so padded-tail masking is
    exercised past the first bucket
  * classify with >MAX_JOIN concatenated reference k-mers (multi-ref
    chunks) and an input table past _MIN_BUCKET, byte-parity across
    the chunk seam + numpy oracle spot checks

Oracle semantics: count.rs:106-135, query.rs:87-103 (multiplicity),
classify.rs:224-266 (matched/breadth/depth).
"""

import json

import numpy as np
import pytest

from orion_kmer_tpu import codec

from .util import run_cli, write_file


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _oracle_count_tsv(seqs, k, min_count=1):
    acc = {}
    for s in seqs:
        for v in codec.extract_kmers_np(codec.seq_to_codes(s.encode()), k).tolist():
            acc[v] = acc.get(v, 0) + 1
    lines = [
        f"{codec.u64_to_seq(v, k).decode()}\t{c}"
        for v, c in sorted(acc.items())
        if c >= min_count
    ]
    return ("\n".join(lines) + "\n") if lines else ""


def _assert_text_equal(got: str, exp: str):
    """Byte-exact compare without pytest's quadratic difflib repr on
    ~1 MB strings (a mismatch hung the suite for minutes)."""
    if got != exp:
        g, e = got.splitlines(), exp.splitlines()
        first = next(
            (i for i, (a, b) in enumerate(zip(g, e)) if a != b), min(len(g), len(e))
        )
        pytest.fail(
            f"TSV mismatch: {len(g)} vs {len(e)} lines; first diff at line "
            f"{first}: {g[first] if first < len(g) else '<eof>'!r} != "
            f"{e[first] if first < len(e) else '<eof>'!r}"
        )


def _count_spills(monkeypatch, table_cls):
    """Wrap table_cls._spill with a call counter (the CLI owns the table
    instance, so the spill must be observed from outside)."""
    calls = {"n": 0}
    orig = table_cls._spill

    def spy(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(table_cls, "_spill", spy)
    return calls


@pytest.mark.parametrize("k", [15, 21, 31])  # single-plane / u48 / pair routes
def test_count_cli_spill_past_device_table_max(tmp_path, monkeypatch, k):
    """The device-resident accumulated table spills to the host tier when
    folds would exceed DEVICE_TABLE_MAX; with the bound lowered below the
    unique count, the CLI count must still be byte-exact (engine._spill +
    CountAccumulator merge, count.rs:119 ordering)."""
    import orion_kmer_tpu.engine as engine
    from orion_kmer_tpu.engine import DeviceCountTable

    # tiny batches -> multiple flush epochs -> multiple table folds, so
    # the capacity bound is genuinely crossed mid-run (one big batch
    # would fold once and never hit it)
    monkeypatch.setattr(engine, "_DEFAULT_BATCH", 8192)
    monkeypatch.setattr(DeviceCountTable, "FLUSH_WINDOWS", 8192)
    monkeypatch.setattr(DeviceCountTable, "DEVICE_TABLE_MAX", 8192)
    spills = _count_spills(monkeypatch, DeviceCountTable)
    rng = np.random.default_rng(100 + k)
    seqs = [_random_seq(rng, 12000) for _ in range(4)]  # ~48k uniques >> 8192
    f = write_file(
        tmp_path / "in.fa", "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs))
    )
    out = tmp_path / "out.tsv"
    assert run_cli("count", "-k", k, "-i", f, "-o", out) == 0
    assert spills["n"] >= 2  # host tier crossed mid-run, not just at result()
    _assert_text_equal(out.read_text(), _oracle_count_tsv(seqs, k))


def test_count_cli_spill_sharded(tmp_path, monkeypatch):
    """Same bound crossing through the ShardedCountTable route (the
    multi-chip table's incremental host-tier consolidation), driven by
    the CLI via ORION_KMER_SHARDS."""
    import orion_kmer_tpu.engine as engine
    from orion_kmer_tpu.parallel.streaming import ShardedCountTable

    monkeypatch.setenv("ORION_KMER_SHARDS", "4")
    monkeypatch.setattr(engine, "_DEFAULT_BATCH", 8192)
    monkeypatch.setattr(ShardedCountTable, "FLUSH_WINDOWS", 8192)
    monkeypatch.setattr(ShardedCountTable, "DEVICE_TABLE_MAX", 8192)
    spills = _count_spills(monkeypatch, ShardedCountTable)
    rng = np.random.default_rng(7)
    seqs = [_random_seq(rng, 10000) for _ in range(3)]
    f = write_file(
        tmp_path / "in.fa", "".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs))
    )
    out = tmp_path / "out.tsv"
    assert run_cli("count", "-k", 21, "-i", f, "-o", out) == 0
    assert spills["n"] >= 1
    _assert_text_equal(out.read_text(), _oracle_count_tsv(seqs, 21))


def test_query_db_and_reads_cross_bucket_boundary(tmp_path):
    """DB uniques > _MIN_BUCKET (4096) and reads > _READS_BUCKET (4096):
    the padded bucket tails must stay masked out and per-read
    multiplicity hit counts exact (query.rs:87-103)."""
    k = 13
    rng = np.random.default_rng(11)
    genome = _random_seq(rng, 6000)  # ~5988 distinct 13-mers > 4096
    gfile = write_file(tmp_path / "g.fa", f">g\n{genome}\n")
    db = tmp_path / "g.db"
    assert run_cli("build", "-k", k, "-g", gfile, "-o", db) == 0

    db_set = set(
        codec.extract_kmers_np(codec.seq_to_codes(genome.encode()), k).tolist()
    )
    assert len(db_set) > 4096  # the boundary is genuinely crossed

    n_reads = 4200  # > _READS_BUCKET
    reads, expected = [], []
    for i in range(n_reads):
        if i % 3 == 0:  # planted: a genome slice (guaranteed hits)
            start = int(rng.integers(0, len(genome) - 40))
            seq = genome[start : start + 40]
        else:
            seq = _random_seq(rng, 40)
        reads.append((f"read{i}", seq))
        hits = sum(
            1
            for v in codec.extract_kmers_np(
                codec.seq_to_codes(seq.encode()), k
            ).tolist()
            if v in db_set
        )
        expected.append((f"read{i}", hits))
    rfile = write_file(
        tmp_path / "reads.fq",
        "".join(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n" for rid, seq in reads),
    )

    for min_hits in (1, 5):
        out = tmp_path / f"hits{min_hits}.txt"
        assert run_cli("query", "-d", db, "-r", rfile, "-o", out, "-c", min_hits) == 0
        got = out.read_text().splitlines()
        exp = [rid for rid, h in expected if h >= min_hits]
        assert got == exp  # input order, exact multiplicity threshold


def test_classify_chunk_seam_and_bucket_boundary(tmp_path, monkeypatch):
    """Multi-reference chunks (several refs per MAX_JOIN chunk, several
    chunks per DB), with both the input table and the concatenated
    reference k-mers past _MIN_BUCKET: byte-parity across the seam and
    numpy-oracle per-reference stats (classify.rs:224-266)."""
    from orion_kmer_tpu.engine import ClassifyJoiner

    k = 13
    rng = np.random.default_rng(23)
    genomes = {f"ref{i}.fa": _random_seq(rng, 1600) for i in range(6)}
    gpaths = [write_file(tmp_path / nm, f">{nm}\n{s}\n") for nm, s in genomes.items()]
    db = tmp_path / "refs.db"
    assert run_cli("build", "-k", k, "-g", *gpaths, "-o", db) == 0

    # input: slices of half the refs + random filler; >4096 unique k-mers
    parts = [genomes[f"ref{i}.fa"][:800] for i in range(3)]
    parts.append(_random_seq(rng, 4000))
    inp = write_file(
        tmp_path / "in.fa",
        "".join(f">s{i}\n{p}\n" for i, p in enumerate(parts)),
    )
    input_kmers = {}
    for p in parts:
        for v in codec.extract_kmers_np(codec.seq_to_codes(p.encode()), k).tolist():
            input_kmers[v] = input_kmers.get(v, 0) + 1
    assert len(input_kmers) > 4096

    o_single, o_chunked = tmp_path / "single.json", tmp_path / "chunked.json"
    t_single, t_chunked = tmp_path / "single.tsv", tmp_path / "chunked.tsv"
    assert (
        run_cli("classify", "-i", inp, "-d", db, "-o", o_single,
                "--output-tsv", t_single) == 0
    )
    # ~1588 uniques/ref: cap 3400 packs 2 refs per chunk, 3 chunks total
    monkeypatch.setattr(ClassifyJoiner, "MAX_JOIN", 3400)
    assert (
        run_cli("classify", "-i", inp, "-d", db, "-o", o_chunked,
                "--output-tsv", t_chunked) == 0
    )
    assert o_single.read_text() == o_chunked.read_text()
    assert t_single.read_text() == t_chunked.read_text()

    # numpy oracle for every reported reference (classify.rs:230-247)
    res = json.loads(o_chunked.read_text())
    refs = {
        r["reference_name"]: r
        for r in res["databases_analyzed"][0]["references"]
    }
    assert set(refs) == set(genomes)  # default --min-coverage 0.0 keeps all
    for nm, seq in genomes.items():
        ref_set = set(
            codec.extract_kmers_np(codec.seq_to_codes(seq.encode()), k).tolist()
        )
        matched = {v for v in input_kmers if v in ref_set}
        r = refs[nm]
        assert r["input_kmers_hitting_reference"] == len(matched)
        assert r["total_kmers_in_reference"] == len(ref_set)
        assert r["sum_depth_of_matched_kmers_in_input"] == sum(
            input_kmers[v] for v in matched
        )
