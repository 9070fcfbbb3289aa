"""On-device exact set algebra over (hi, lo)-encoded k-mer sets.

The reference uses std HashSet probes for membership (query.rs:90,
classify.rs:230-236) and intersection counting (compare.rs:58).  The
TPU-native equivalent is a sort-merge join: concatenate the two streams
with a provenance flag, sort lexicographically by (hi, lo, flag) with
XLA's variadic sort, and answer membership / intersection questions from
run structure.  Deterministic, collision-free, no 64-bit emulation, and
scatter/gather-free: the run head's provenance propagates forward with a
segmented-copy associative scan, and query order is restored either by
monotone-shift compaction (when queries are sorted unique, the classify
case) or by one more single-key sort (the general case) -- XLA scatters
and gathers cost ~16 / ~15 ms per 1M elements on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import SENTINEL

U32 = jnp.uint32


def _member_sorted(qh, ql, q_extra, dh, dl, db_valid, db_extra_fill=()):
    """Sort-merge join core.

    Returns (member, flag==1, extras) all in joined-sorted order, where
    member marks query elements whose run head is a db entry and extras
    are q_extra payload planes carried through the sort; db rows hold
    db_extra_fill[j] in extras plane j (default 0).  NOTE: flag==1 also
    covers INVALID db slots (padding gets flag 1 so sentinel-valued
    queries can never "match" it) -- callers distinguishing real queries
    must do so via an extras plane with a distinct db fill.
    """
    nq = qh.shape[0]
    nd = dh.shape[0]
    hi = jnp.concatenate([dh, qh])
    lo = jnp.concatenate([dl, ql])
    # flag: 0 = db entry, 1 = query/padding. Within a run of equal
    # (hi, lo) the db entry (unique) sorts first.
    flag = jnp.concatenate(
        [jnp.where(db_valid, 0, 1).astype(U32), jnp.ones((nq,), U32)]
    )
    extras = [
        jnp.concatenate(
            [
                jnp.full((nd,), db_extra_fill[j] if j < len(db_extra_fill) else 0, e.dtype),
                e,
            ]
        )
        for j, e in enumerate(q_extra)
    ]
    sorted_all = jax.lax.sort((hi, lo, flag, *extras), num_keys=3)
    shi, slo, sflag = sorted_all[:3]
    sextras = sorted_all[3:]

    n = nd + nq
    idx = jnp.arange(n, dtype=jnp.int32)
    prev_hi = jnp.concatenate([jnp.full((1,), SENTINEL, U32), shi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), SENTINEL, U32), slo[:-1]])
    is_head = ((shi != prev_hi) | (slo != prev_lo)) | (idx == 0)

    # "my run contains a db entry" == the last db row at or before me is
    # at or after my run's head (the db row, unique per run, sorts first
    # within its run).  Two native cummax ops -- no gathers, no scans.
    last_db = jax.lax.cummax(jnp.where(sflag == 0, idx, -1))
    head_pos = jax.lax.cummax(jnp.where(is_head, idx, -1))
    member = (sflag == 1) & (last_db >= head_pos)
    return member, sflag == 1, sextras


@jax.jit
def membership(q_hi, q_lo, q_valid, db_hi, db_lo, db_valid):
    """For each query element, is it present in the db set?

    db entries must be unique where db_valid.  Invalid queries/db slots
    are sentinel-masked and never match.  Returns bool[Nq] aligned with
    the query order (restored with a single-key position sort).
    """
    nq = q_hi.shape[0]
    qh = jnp.where(q_valid, q_hi, SENTINEL)
    ql = jnp.where(q_valid, q_lo, SENTINEL)
    dh = jnp.where(db_valid, db_hi, SENTINEL)
    dl = jnp.where(db_valid, db_lo, SENTINEL)
    pos = jnp.arange(nq, dtype=jnp.int32)
    # db rows (valid OR padding) carry pos = nq so they sort past every
    # real query position in the restore sort
    member, _, (spos,) = _member_sorted(
        qh, ql, [pos], dh, dl, db_valid, db_extra_fill=(nq,)
    )
    _, smember = jax.lax.sort((spos, member.astype(U32)), num_keys=1)
    return smember[:nq] == 1


@jax.jit
def membership_sorted(q_hi, q_lo, q_valid, db_hi, db_lo, db_valid):
    """Membership for queries that are SORTED UNIQUE with a valid prefix
    (the classify case: the input k-mer table).

    Returns bool[Nq] aligned with the query order.  Because the queries
    arrive sorted with invalids only in the tail, their joined-sorted
    order IS their input order, so order restoration is one monotone
    compaction instead of the general path's second sort.
    """
    from .count import _compact_left

    nq = q_hi.shape[0]
    qh = jnp.where(q_valid, q_hi, SENTINEL)
    ql = jnp.where(q_valid, q_lo, SENTINEL)
    dh = jnp.where(db_valid, db_hi, SENTINEL)
    dl = jnp.where(db_valid, db_lo, SENTINEL)
    is_real_q = jnp.ones((nq,), U32)
    member, _, (sreal,) = _member_sorted(
        qh, ql, [is_real_q], dh, dl, db_valid, db_extra_fill=(0,)
    )
    (cmember,) = _compact_left([member.astype(U32)], sreal == 1)
    return cmember[:nq] == 1


@jax.jit
def intersection_size(a_hi, a_lo, a_valid, b_hi, b_lo, b_valid):
    """|A intersect B| for two unique sets (compare.rs:58 semantics)."""
    ah = jnp.where(a_valid, a_hi, SENTINEL)
    al = jnp.where(a_valid, a_lo, SENTINEL)
    bh = jnp.where(b_valid, b_hi, SENTINEL)
    bl = jnp.where(b_valid, b_lo, SENTINEL)
    hi = jnp.concatenate([ah, bh])
    lo = jnp.concatenate([al, bl])
    valid = jnp.concatenate([a_valid, b_valid])
    shi, slo, svalid = jax.lax.sort((hi, lo, valid.astype(U32)), num_keys=2)
    eq_prev = (shi[1:] == shi[:-1]) & (slo[1:] == slo[:-1])
    both_valid = (svalid[1:] == 1) & (svalid[:-1] == 1)
    return (eq_prev & both_valid).astype(jnp.int32).sum()
