"""Deterministic on-device k-mer counting: sort + run-length encode.

TPU-first replacement for the reference's concurrent hash map
(DashMap<u64, AtomicUsize>, count.rs:23-38) and unique set
(DashSet<u64>, build.rs:23-78).  Instead of a lock-based table, the batch
of canonical k-mers is sorted with XLA's variadic sort (lexicographic on
the (hi, lo) uint32 pair) and runs are collapsed with segment sums --
fully deterministic, data-race-free by construction, and bandwidth-bound
on the sort which is what TPUs are good at.

Invalid windows carry the SENTINEL pair which sorts to the end and is
dropped by validity accounting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import SENTINEL

U32 = jnp.uint32


def _mask_to_sentinel(hi, lo, valid):
    hi = jnp.where(valid, hi, SENTINEL)
    lo = jnp.where(valid, lo, SENTINEL)
    return hi, lo


def _rle_sorted(shi, slo, n_valid):
    """Run-length encode a sorted (hi, lo) stream whose valid prefix has
    length n_valid.  Returns compacted unique pairs, their counts and the
    number of uniques; the tail of the output arrays is SENTINEL/0."""
    n = shi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    in_prefix = idx < n_valid
    prev_hi = jnp.concatenate([jnp.full((1,), SENTINEL, U32), shi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), SENTINEL, U32), slo[:-1]])
    is_new = (shi != prev_hi) | (slo != prev_lo)
    is_head = (is_new | (idx == 0)) & in_prefix

    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # segment id per element
    seg_safe = jnp.where(in_prefix, seg, n)  # out-of-range => dropped

    counts = jnp.zeros((n,), jnp.int32).at[seg_safe].add(
        in_prefix.astype(jnp.int32), mode="drop"
    )
    head_target = jnp.where(is_head, seg, n)
    uhi = jnp.full((n,), SENTINEL, U32).at[head_target].set(shi, mode="drop")
    ulo = jnp.full((n,), SENTINEL, U32).at[head_target].set(slo, mode="drop")
    n_unique = is_head.astype(jnp.int32).sum()
    return uhi, ulo, counts, n_unique


@jax.jit
def count_kmers(hi: jnp.ndarray, lo: jnp.ndarray, valid: jnp.ndarray):
    """Count occurrences of each distinct (hi, lo) pair.

    Returns (unique_hi, unique_lo, counts, n_unique); uniques are sorted
    ascending by the 64-bit value (== lexicographic k-mer string order,
    the determinism anchor of count.rs:119).
    """
    hi, lo = _mask_to_sentinel(hi, lo, valid)
    n_valid = valid.astype(jnp.int32).sum()
    shi, slo = jax.lax.sort((hi, lo), num_keys=2)
    return _rle_sorted(shi, slo, n_valid)


@jax.jit
def unique_kmers(hi: jnp.ndarray, lo: jnp.ndarray, valid: jnp.ndarray):
    """Distinct (hi, lo) pairs, sorted ascending (build.rs:55 semantics)."""
    uhi, ulo, _counts, n_unique = count_kmers(hi, lo, valid)
    return uhi, ulo, n_unique


@partial(jax.jit, static_argnames=("num_reads",))
def hits_per_read(member: jnp.ndarray, owner: jnp.ndarray, num_reads: int):
    """Sum window-level DB hits per read (query.rs:87-94 multiplicity
    semantics: every matching window counts, repeats included)."""
    return jnp.zeros((num_reads,), jnp.int32).at[owner].add(
        member.astype(jnp.int32), mode="drop"
    )
