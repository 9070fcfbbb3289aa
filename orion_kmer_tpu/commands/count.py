"""count command: canonical k-mer counting over FASTA/FASTQ inputs.

Parity target: orion-kmer `count` (commands/count.rs:40-141).
Output: `KMER\\tCOUNT` lines, count >= min_count, sorted ascending by the
encoded u64 (== lexicographic string order; count.rs:119).
"""

from __future__ import annotations

import logging

import numpy as np

from .. import codec
from ..engine import count_file
from ..errors import ContextError, validate_k
from ..ingest.compress import TextOut
from ..ingest.fastx import FastxParseError
from ..utils import track_progress_and_resources

logger = logging.getLogger("orion_kmer_tpu.count")


def write_counts_tsv(path, vals: np.ndarray, counts: np.ndarray, k: int) -> None:
    """Write sorted `kmer\\tcount` lines (count.rs:127-135)."""
    with TextOut(path) as f:
        chunk = 1 << 16
        for start in range(0, vals.shape[0], chunk):
            seqs = codec.u64s_to_seqs(vals[start : start + chunk], k)
            cnts = counts[start : start + chunk].tolist()
            f.write(
                "".join(
                    f"{s.decode('ascii')}\t{c}\n" for s, c in zip(seqs, cnts)
                )
            )


def run_count(args) -> None:
    validate_k(args.kmer_size)
    k = args.kmer_size

    from ..engine import CountAccumulator

    acc = CountAccumulator()

    def task(pb):
        for input_path in args.input_files:
            logger.info("Processing file: %s", input_path)
            pb.set_message(f"Processing: {input_path}")
            try:
                vals, cnt = count_file(input_path, k)
            except FastxParseError as e:
                raise ContextError(
                    f"Failed to open or parse file: {input_path}", e
                ) from e
            acc.add(vals, cnt.astype("int64"))
            pb.inc(1)

    track_progress_and_resources(
        "Counting k-mers from input files", len(args.input_files), task
    )

    vals, counts = acc.result()
    keep = counts >= args.min_count
    vals, counts = vals[keep], counts[keep]
    logger.info(
        "Writing %d k-mers (count >= %d) to output file...", vals.shape[0], args.min_count
    )
    write_counts_tsv(args.output_file, vals, counts, k)
