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


def _rle_sorted(shi, slo, n_valid, weights=None):
    """Run-length encode a sorted (hi, lo) stream whose valid prefix has
    length n_valid.  Returns compacted unique pairs, their summed weights
    (1 per element when weights is None) and the number of uniques; the
    tail of the output arrays is SENTINEL/0."""
    n = shi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    in_prefix = idx < n_valid
    prev_hi = jnp.concatenate([jnp.full((1,), SENTINEL, U32), shi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), SENTINEL, U32), slo[:-1]])
    is_new = (shi != prev_hi) | (slo != prev_lo)
    is_head = (is_new | (idx == 0)) & in_prefix

    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # segment id per element
    seg_safe = jnp.where(in_prefix, seg, n)  # out-of-range => dropped

    contrib = (
        in_prefix.astype(jnp.int32)
        if weights is None
        else jnp.where(in_prefix, weights, 0)
    )
    counts = jnp.zeros((n,), jnp.int32).at[seg_safe].add(contrib, mode="drop")
    head_target = jnp.where(is_head, seg, n)
    uhi = jnp.full((n,), SENTINEL, U32).at[head_target].set(shi, mode="drop")
    ulo = jnp.full((n,), SENTINEL, U32).at[head_target].set(slo, mode="drop")
    n_unique = is_head.astype(jnp.int32).sum()
    return uhi, ulo, counts, n_unique


@partial(jax.jit, static_argnames=("k",))
def count_codes(codes: jnp.ndarray, k: int):
    """Fused single-dispatch count: derive the invalid mask on device
    (code 255 marks invalid bases -- halves host->device traffic),
    extract canonical k-mers, sort, RLE."""
    from .kmers import extract_canonical

    invalid = codes > 3
    hi, lo, valid = extract_canonical(codes, invalid, k)
    return count_kmers(hi, lo, valid)


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


def unpack_lanes(lanes: jnp.ndarray, invalid_words: jnp.ndarray):
    """Expand transfer-packed bases: 16 bases/u32 lane + 32 invalid
    bits/u32 word -> (codes u32[N], invalid bool[N]), N = 16*len(lanes).

    The 5x denser wire format matters because host->device bandwidth is
    the pipeline's scarcest resource (PCIe, or worse, a tunnel).
    """
    shifts2 = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    codes = ((lanes[:, None] >> shifts2) & U32(3)).reshape(-1)
    shifts1 = jnp.arange(32, dtype=jnp.uint32)[None, :]
    invalid = (((invalid_words[:, None] >> shifts1) & U32(1)) == 1).reshape(-1)
    return codes, invalid


@partial(jax.jit, static_argnames=("k",))
def count_packed(lanes: jnp.ndarray, invalid_words: jnp.ndarray, k: int):
    """count_codes over the packed wire format, via the lane-parallel
    extractor (ops/kmers_lanes.py) -- no byte-per-base expansion, and
    counting is order-independent so the (offset, lane) layout flattens
    straight into the sort."""
    from .kmers_lanes import extract_canonical_lanes

    n_positions = lanes.shape[0] * 16
    hi, lo, valid = extract_canonical_lanes(lanes, invalid_words, k, n_positions)
    return count_kmers(hi.reshape(-1), lo.reshape(-1), valid.reshape(-1))


@jax.jit
def merge_runs(a_hi, a_lo, a_cnt, a_n, b_hi, b_lo, b_cnt, b_n):
    """Merge two sorted-unique weighted runs into one (LSM-forest step).

    Inputs are sentinel-padded past their valid counts a_n / b_n; output
    arrays have size len(a) + len(b), sorted unique with summed counts.
    """
    hi = jnp.concatenate([a_hi, b_hi])
    lo = jnp.concatenate([a_lo, b_lo])
    cnt = jnp.concatenate([a_cnt, b_cnt])
    shi, slo, scnt = jax.lax.sort((hi, lo, cnt), num_keys=2)
    return _rle_sorted(shi, slo, a_n + b_n, weights=scnt)


@partial(jax.jit, static_argnames=("k",))
def merge_count_batch_packed(
    table_hi, table_lo, table_cnt, n_table, lanes, invalid_words, k: int
):
    """merge_count_batch over the packed wire format."""
    bhi, blo, bcnt, n_b = count_packed(lanes, invalid_words, k)
    hi = jnp.concatenate([table_hi, bhi])
    lo = jnp.concatenate([table_lo, blo])
    cnt = jnp.concatenate([table_cnt, bcnt])
    shi, slo, scnt = jax.lax.sort((hi, lo, cnt), num_keys=2)
    n_valid = n_table + n_b
    return _rle_sorted(shi, slo, n_valid, weights=scnt)


@partial(jax.jit, static_argnames=("k",))
def merge_count_batch(table_hi, table_lo, table_cnt, n_table, codes, k: int):
    """Device-resident accumulation: fold one code batch into a merged
    count table without any host round-trip.

    The table is sorted unique (hi, lo) with int32 counts, sentinel-padded
    past n_table.  A fresh batch is extracted+counted, concatenated with
    the table, re-sorted with counts carried, and run-length summed.
    Output arrays have size len(table) + len(codes); the caller tracks
    n_merged and re-buckets capacity as needed.
    """
    bhi, blo, bcnt, n_b = count_codes(codes, k)
    hi = jnp.concatenate([table_hi, bhi])
    lo = jnp.concatenate([table_lo, blo])
    cnt = jnp.concatenate([table_cnt, bcnt])
    shi, slo, scnt = jax.lax.sort((hi, lo, cnt), num_keys=2)
    n_valid = n_table + n_b
    uhi, ulo, ucnt, n_u = _rle_sorted(shi, slo, n_valid, weights=scnt)
    return uhi, ulo, ucnt, n_u


@partial(jax.jit, static_argnames=("num_reads",))
def hits_per_read(member: jnp.ndarray, owner: jnp.ndarray, num_reads: int):
    """Sum window-level DB hits per read (query.rs:87-94 multiplicity
    semantics: every matching window counts, repeats included)."""
    return jnp.zeros((num_reads,), jnp.int32).at[owner].add(
        member.astype(jnp.int32), mode="drop"
    )
