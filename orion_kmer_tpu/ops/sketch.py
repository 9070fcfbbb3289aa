"""FracMinHash / MinHash sketching on device.

New capability required by BASELINE.json config 3 (no reference
implementation exists in orion-kmer): scaled (FracMinHash) sketches over
the canonical k-mer hash stream, with Jaccard / containment estimators.

A k-mer is kept iff splitmix64(kmer) < 2^64 / scaled -- the standard
sourmash-style fraction-of-hash-space subsample.  Keeping is a pure
elementwise threshold on the (hi, lo) hash pair, fused by XLA into the
extraction chain; dedup + abundance reuse the sort+RLE counting kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .count import count_kmers
from .hash import splitmix64_np, splitmix64_pair
from .kmers import extract_canonical

U32 = jnp.uint32


def scaled_threshold(scaled: int) -> tuple[int, int]:
    """(hi, lo) words of floor(2^64 / scaled)."""
    if scaled < 1:
        raise ValueError(f"scaled must be >= 1, got {scaled}")
    thr = (1 << 64) // scaled
    return (thr >> 32) & 0xFFFFFFFF, thr & 0xFFFFFFFF


@partial(jax.jit, static_argnames=("k", "scaled"))
def sketch_batch(codes, invalid, k: int, scaled: int):
    """Extract canonical k-mers, hash, keep h < 2^64/scaled, dedupe+count.

    Returns (uhash_hi, uhash_lo, counts, n_unique): sorted unique KEPT
    hash values with their abundances.
    """
    hi, lo, valid = extract_canonical(codes, invalid, k)
    hhi, hlo = splitmix64_pair(hi, lo)
    if scaled == 1:
        keep = valid  # threshold is the full 2^64 space: keep everything
    else:
        thr_hi, thr_lo = scaled_threshold(scaled)
        thr_hi = np.uint32(thr_hi)
        thr_lo = np.uint32(thr_lo)
        keep = valid & ((hhi < thr_hi) | ((hhi == thr_hi) & (hlo < thr_lo)))
    return count_kmers(hhi, hlo, keep)


def sketch_compare(a: np.ndarray, b: np.ndarray) -> dict:
    """Jaccard/containment estimates between two sorted hash sets.

    FracMinHash estimators: since both sketches subsample the SAME hash
    space fraction, plain set Jaccard/containment over the sketch hashes
    estimates the genome-level values.
    """
    inter = np.intersect1d(a, b).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return {
        "intersection": int(inter),
        "union": int(union),
        "jaccard": (inter / union) if union else 0.0,
        "containment_a_in_b": (inter / a.shape[0]) if a.shape[0] else 0.0,
        "containment_b_in_a": (inter / b.shape[0]) if b.shape[0] else 0.0,
    }


def sketch_np(vals: np.ndarray, scaled: int) -> np.ndarray:
    """Host oracle: FracMinHash of uint64 canonical k-mers."""
    h = splitmix64_np(np.unique(vals))
    thr = np.uint64((1 << 64) // scaled)
    return np.unique(h[h < thr])
