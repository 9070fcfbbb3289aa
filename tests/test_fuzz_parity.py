"""End-to-end randomized parity: full CLI vs the numpy semantic oracle.

The Rust binary can't run in this image, so the oracle is codec.py --
itself pinned to kmer.rs by the ported unit table (test_codec.py).
These fuzz cases cover the full stack: parser -> native pack -> device
extraction -> device accumulation -> output formatting.
"""

import numpy as np
import pytest

from orion_kmer_tpu import codec
from orion_kmer_tpu.db import KmerDb

from .util import run_cli, write_file


def _random_fasta(rng, n_records, max_len=300):
    recs = []
    for i in range(n_records):
        ln = int(rng.integers(0, max_len))
        seq = "".join(rng.choice(list("ACGTacgtNnU-"), size=ln, p=[
            0.2, 0.2, 0.2, 0.2, 0.04, 0.04, 0.04, 0.04, 0.02, 0.01, 0.005, 0.005
        ]))
        recs.append((f"rec{i} desc", seq))
    return recs


def _oracle_counts(recs, k):
    acc = {}
    for _rid, seq in recs:
        vals = codec.extract_kmers_np(codec.seq_to_codes(seq.encode()), k)
        for v in vals.tolist():
            acc[v] = acc.get(v, 0) + 1
    return acc


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 13), (2, 21), (3, 31), (4, 32), (5, 1)])
def test_count_cli_fuzz(tmp_path, seed, k):
    rng = np.random.default_rng(seed)
    recs = _random_fasta(rng, 30)
    content = "".join(f">{rid}\n{seq}\n" for rid, seq in recs)
    f = write_file(tmp_path / "in.fa", content)
    out = tmp_path / "out.tsv"
    assert run_cli("count", "-k", k, "-i", f, "-o", out) == 0

    exp = _oracle_counts(recs, k)
    got = {}
    for line in out.read_text().strip().splitlines():
        kmer_str, cnt = line.split("\t")
        got[codec.seq_to_u64(kmer_str.encode(), k)] = int(cnt)
    assert got == exp

    # ascending order check
    keys = [line.split("\t")[0] for line in out.read_text().strip().splitlines()]
    assert keys == sorted(keys)


@pytest.mark.parametrize("seed,k", [(10, 7), (11, 17)])
def test_build_cli_fuzz(tmp_path, seed, k):
    rng = np.random.default_rng(seed)
    recs = _random_fasta(rng, 20)
    content = "".join(f">{rid}\n{seq}\n" for rid, seq in recs)
    f = write_file(tmp_path / "genome.fa", content)
    db_path = tmp_path / "g.db"
    assert run_cli("build", "-k", k, "-g", f, "-o", db_path) == 0
    db = KmerDb.load(db_path)
    exp = set(_oracle_counts(recs, k))
    assert set(db.references["genome.fa"].tolist()) == exp


def test_count_fastq_multiline_fasta_mix(tmp_path):
    # multi-line FASTA records concatenate before windowing
    content = ">s1\nACGTAC\nGTACGT\n>s2\nTT\nTT\n"
    f = write_file(tmp_path / "m.fa", content)
    out = tmp_path / "o.tsv"
    assert run_cli("count", "-k", 4, "-i", f, "-o", out) == 0
    exp = _oracle_counts([("s1", "ACGTACGTACGT"), ("s2", "TTTT")], 4)
    got = {
        codec.seq_to_u64(l.split("\t")[0].encode(), 4): int(l.split("\t")[1])
        for l in out.read_text().strip().splitlines()
    }
    assert got == exp
