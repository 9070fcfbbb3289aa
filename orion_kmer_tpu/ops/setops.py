"""On-device exact set algebra over (hi, lo)-encoded k-mer sets.

The reference uses std HashSet probes for membership (query.rs:90,
classify.rs:230-236) and intersection counting (compare.rs:58).  The
TPU-native equivalent is a sort-merge join: concatenate the two streams
with a provenance flag, sort lexicographically by (hi, lo, flag) with
XLA's variadic sort, and answer membership / intersection questions from
run structure.  Deterministic, collision-free, no 64-bit emulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .kmers import SENTINEL

U32 = jnp.uint32


@jax.jit
def membership(q_hi, q_lo, q_valid, db_hi, db_lo, db_valid):
    """For each query element, is it present in the db set?

    db entries must be unique where db_valid.  Invalid queries/db slots
    are sentinel-masked and never match.  Returns bool[Nq] aligned with
    the query order.
    """
    nq = q_hi.shape[0]
    nd = db_hi.shape[0]

    qh = jnp.where(q_valid, q_hi, SENTINEL)
    ql = jnp.where(q_valid, q_lo, SENTINEL)
    dh = jnp.where(db_valid, db_hi, SENTINEL)
    dl = jnp.where(db_valid, db_lo, SENTINEL)

    hi = jnp.concatenate([dh, qh])
    lo = jnp.concatenate([dl, ql])
    # flag: 0 = db entry, 1 = query/padding. Within a run of equal (hi,lo)
    # the db entry (unique) sorts first.  Invalid db slots get flag 1 so
    # sentinel-valued queries can never "match" the padding.
    flag = jnp.concatenate(
        [jnp.where(db_valid, 0, 1).astype(U32), jnp.ones((nq,), U32)]
    )
    # original query position (db rows get nq => dropped on scatter)
    pos = jnp.concatenate(
        [jnp.full((nd,), nq, jnp.int32), jnp.arange(nq, dtype=jnp.int32)]
    )

    shi, slo, sflag, spos = jax.lax.sort((hi, lo, flag, pos), num_keys=3)

    prev_hi = jnp.concatenate([jnp.full((1,), SENTINEL, U32), shi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), SENTINEL, U32), slo[:-1]])
    idx = jnp.arange(nd + nq, dtype=jnp.int32)
    is_head = ((shi != prev_hi) | (slo != prev_lo)) | (idx == 0)

    # Run id per element; the head of a run is a db entry iff flag == 0.
    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    head_is_db = jnp.zeros((nd + nq,), jnp.bool_).at[
        jnp.where(is_head, seg, nd + nq)
    ].set(sflag == 0, mode="drop")
    member_sorted = (sflag == 1) & head_is_db[seg]

    out = jnp.zeros((nq,), jnp.bool_).at[spos].set(member_sorted, mode="drop")
    return out


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
