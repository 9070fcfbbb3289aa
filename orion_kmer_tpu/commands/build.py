"""build command: per-genome unique canonical k-mer sets -> KmerDb file.

Parity target: orion-kmer `build` (commands/build.rs:80-160).
Reference name = input file basename including extensions
(build.rs:106-109); DB serialized bincode-compatibly then compressed by
output extension (build.rs:141-146).
"""

from __future__ import annotations

import logging
import os

from ..db import KmerDb
from ..engine import count_file
from ..errors import ContextError, validate_k
from ..ingest.fastx import FastxParseError
from ..utils import track_progress_and_resources

logger = logging.getLogger("orion_kmer_tpu.build")


def run_build(args) -> None:
    validate_k(args.kmer_size)
    k = args.kmer_size

    db = KmerDb(k=k)

    def task(pb):
        for input_path in args.genome_files:
            try:
                kmers, _ = count_file(input_path, k)
            except FastxParseError as e:
                raise ContextError(
                    f"Failed to open or parse FASTA/Q file: {input_path}", e
                ) from e
            reference_name = os.path.basename(str(input_path)) or str(input_path)
            logger.info(
                "Adding %d unique k-mers from reference '%s' to the database.",
                kmers.shape[0],
                reference_name,
            )
            db.add_reference(reference_name, kmers)
            pb.set_message(f"Processed: {reference_name}")
            pb.inc(1)

    track_progress_and_resources(
        "Building k-mer database", len(args.genome_files), task
    )

    logger.info(
        "Database contains %d references and %d total unique canonical k-mers.",
        db.num_references(),
        db.total_unique_kmers(),
    )
    try:
        db.save(args.output_file)
    except OSError as e:
        raise ContextError(
            f"Failed to get output writer for database file: {args.output_file!r}", e
        ) from e
