"""Shared test helpers: in-process CLI runner + fixture data.

Fixture FASTA/FASTQ contents mirror the reference's inline test constants
and tests/data files (count_tests.rs:138-141, test_input1.fasta,
test_input2.fastq) so golden outputs are directly comparable.
"""

from __future__ import annotations

import gzip
import lzma
from pathlib import Path

import zstandard

from orion_kmer_tpu.cli import main as cli_main

# count_tests.rs:138-141
SAMPLE1_FASTA = ">seq1\nACGTACGTACGT\n>seq2\nTTTTCCCCGGGGAAAA\n>seq3\nAgCtAgCtNaCcGgTt\n"
SAMPLE2_FASTQ = (
    "@read1\nGATTACA\n+\n!!!!!!!\n@read2\nTACATACA\n+\n!!!!!!!!\n"
    "@read3\natatatNnN\n+\n!!!!!!!!!\n"
)

# tests/data/test_input1.fasta (decompressed from the reference .gz fixture)
TEST_INPUT1_FASTA = (
    ">seq1\nACGTACGTACGT\n>seq2\nTGCATGCATGCANNNACGT\n>seq3\nGATTACA\nNNNNN\nGATTACA\n"
)
# tests/data/test_input2.fastq
TEST_INPUT2_FASTQ = (
    "@read1\nCGTACGTACG\n+\nFFFFFFFFJJ\n@read2\nGCATGCATGC\n+\nJJJJJJJJJJ\n"
    "@read3 NNN\nGATTACANNN\n+\nFFFFFFF###\n"
)


def run_cli(*argv: str) -> int:
    """Run the CLI in-process; returns the exit code."""
    return cli_main([str(a) for a in argv])


def write_file(path: Path, content: str) -> Path:
    """Write text content, compressing according to the path extension."""
    data = content.encode()
    suffix = path.suffix
    if suffix == ".gz":
        path.write_bytes(gzip.compress(data, compresslevel=6))
    elif suffix == ".xz":
        path.write_bytes(lzma.compress(data, preset=6))
    elif suffix in (".zst", ".zstd"):
        path.write_bytes(zstandard.ZstdCompressor().compress(data))
    else:
        path.write_bytes(data)
    return path


def read_maybe_gz(path: Path) -> str:
    if path.suffix == ".gz":
        return gzip.decompress(path.read_bytes()).decode()
    if path.suffix == ".xz":
        return lzma.decompress(path.read_bytes()).decode()
    if path.suffix in (".zst", ".zstd"):
        return zstandard.ZstdDecompressor().decompress(path.read_bytes()).decode()
    return path.read_text()


def sort_lines(content: str) -> str:
    return "\n".join(sorted(content.strip().splitlines()))


def kmers_from_strings(strs, k):
    """Expected-set helper mirroring build_tests.rs:116-120."""
    from orion_kmer_tpu import codec

    return {codec.canonical_u64(codec.seq_to_u64(s.encode(), k), k) for s in strs}


def build_db(tmp_path: Path, k: int, files: list[tuple[str, str]], out_name="test.db"):
    """Run `build` over (filename, content) inputs; returns db path."""
    gdir = tmp_path / "genomes"
    gdir.mkdir(exist_ok=True)
    paths = [write_file(gdir / name, content) for name, content in files]
    db_path = tmp_path / out_name
    rc = run_cli("build", "-k", k, "-o", db_path, "-g", *paths)
    assert rc == 0
    return db_path
