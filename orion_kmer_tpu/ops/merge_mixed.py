"""Mixed-dtype merge path: carry the narrowed b plane as a REAL uint16
through the k=17..24 merge forest (CLAUDE.md backlog #1, second lever).

The 32 < 2k <= 48 pipeline (ops/count.sort_canonical_packed_u48) narrows
keys to a (t u32, b u16) pair for the chunk sorts but widens b back to
u32 before the bitonic-merge tree, because ops/sort_pallas.py's merge
wrappers cast every plane to u32.  The LSM merge forest is the dominant
post-sort traffic (forest runs are raw weight-1 streams merged
O(log(total/batch)) times each), so an honest u16 b plane cuts merge
HBM traffic from 8 to 6 bytes/element (~25%), worth an estimated +8-10%
sustained at k=21 (half the BASELINE.json north-star metric).

This module builds that path WITHOUT touching sort_pallas.py: the stage
functions there (_gt / _ce_rows / _ce_lanes / the kernel builders) are
dtype-agnostic jnp code; only the two pallas_call wrappers hardcode u32
out_shape/scratch.  We re-wrap them with per-plane dtypes (editing
sort_pallas.py would invalidate the persistent compile cache for every
existing program -- a full recompile storm on the tunneled TPU).

STATUS: gated by ORION_KMER_U16_FOREST (default off).  Correct under
interpret mode and the XLA fallback (tests/test_merge_mixed.py).
On-chip round 4 (tools/probe_u16_mosaic.py): Mosaic v5e rejects 16-bit
vector compares (both signednesses: "Target does not support this
comparison") and pltpu.roll on u16; select/sublane-reshape/transpose
lower fine.  Fixed in sort_pallas._gt/_ce_lanes by widening u16 planes
to u32 IN-REGISTER for the compare/roll only (VMEM blocks and DMAs stay
6 B/element, which is where the win lives) -- the edits keep every
u32-path traced line byte-identical (TPU lowering diffed empty), so the
persistent compile cache for the default pipeline survived.

Reference parity: same count semantics as count.rs:106-135; the (t, b)
split is kmer.rs:37-57's MSB-first 2k-bit packing re-split at bit
2k-32 (see ops/count.narrow_u48).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .count import _rle_sorted, _widen_b16, narrow_u48
from .kmers import SENTINEL
from .sort_pallas import (
    _LANES,
    MERGE_BLOCK,
    U32,
    _ce_fused_kernel,
    _ce_xla_asc,
    _gt,
    _log2,
    _merge_tail_kernel,
    _pallas_ok,
    use_pallas_sort,
)
from .sort_pallas import COMPACT_BLOCK_ROWS as _CBR

U16 = jnp.uint16


def u16_forest_enabled() -> bool:
    """ORION_KMER_U16_FOREST=1 switches the 32 < 2k <= 48 DeviceCountTable
    forest to (t u32, b u16) runs.  Off by default until the Mosaic u16
    path is validated on the chip (see module docstring)."""
    return os.environ.get("ORION_KMER_U16_FOREST", "0") == "1"


def _ce_fused_call_mixed(planes2d, strides, interpret: bool, n_keys: int = 2):
    """sort_pallas._ce_fused_call with per-plane dtypes preserved.

    The kernel builder itself (_ce_fused_kernel) is dtype-agnostic: the
    compare runs on the key planes' native dtypes (u16 unsigned compare
    on the VPU) and the swaps/scratch/DMA just move whatever dtype each
    plane carries -- so only the out_shape / scratch declarations here
    differ from the u32 original.
    """
    rows = planes2d[0].shape[0]
    n_planes = len(planes2d)
    Rb = _CBR
    nblocks = rows // Rb
    m = len(strides)
    offs = [s // (Rb * _LANES) for s in strides]
    bit_offs = [offs[m - 1 - j] for j in range(m)]
    positions = sorted(int(o).bit_length() - 1 for o in bit_offs)

    def base_of(g):
        x = g
        for p in positions:
            low = x & ((1 << p) - 1)
            x = ((x >> p) << (p + 1)) | low
        return x

    def view_map(combo):
        off = 0
        for j in range(m):
            if combo & (1 << j):
                off += bit_offs[j]
        return lambda g: (base_of(g) + off, 0)

    specs = []
    for combo in range(1 << m):
        specs += [
            pl.BlockSpec((Rb, _LANES), view_map(combo), memory_space=pltpu.VMEM)
        ] * n_planes
    args = []
    for _combo in range(1 << m):
        args += list(planes2d)
    V = 1 << m
    dtypes = [p.dtype for p in planes2d]
    outs = pl.pallas_call(
        _ce_fused_kernel(n_planes, m, bit_offs, positions, n_keys),
        grid=(nblocks >> m,),
        in_specs=specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_planes,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), dt) for dt in dtypes],
        scratch_shapes=[pltpu.VMEM((Rb, _LANES), dt) for _v in range(V) for dt in dtypes]
        + [pltpu.SemaphoreType.DMA((V * n_planes,))],
        interpret=interpret,
    )(*args)
    return list(outs)


def _merge_halves_mixed(a_planes, b_planes, interpret: bool, n_keys: int = 2):
    """sort_pallas._merge_halves with per-plane dtypes preserved (see
    that docstring for the bitonic-split recursion; logic is identical,
    only the pallas_call declarations carry each plane's dtype)."""
    n = a_planes[0].shape[0] + b_planes[0].shape[0]
    rows = n // _LANES
    na = a_planes[0].shape[0]
    if na != n // 2:
        planes2d = [
            jnp.concatenate([pa, pb[::-1]]).reshape(rows, _LANES)
            for pa, pb in zip(a_planes, b_planes)
        ]
        s = n // 2
    else:
        a2 = [p.reshape(rows // 2, _LANES) for p in a_planes]
        rb = [jnp.flip(p.reshape(rows // 2, _LANES), (0, 1)) for p in b_planes]
        gt = _gt(a2, rb, n_keys)
        planes2d = [
            jnp.concatenate([jnp.where(gt, q, p), jnp.where(gt, p, q)])
            for p, q in zip(a2, rb)
        ]
        s = n // 4
    merge_block = MERGE_BLOCK if len(planes2d) <= 4 else MERGE_BLOCK // 2
    B = min(n, merge_block)
    strides = []
    while s >= B:
        strides.append(s)
        s //= 2
    max_group = 3 if len(planes2d) <= 2 else 2
    i = 0
    while i < len(strides):
        grp = strides[i : i + max_group]
        if len(grp) >= 2:
            planes2d = _ce_fused_call_mixed(planes2d, grp, interpret, n_keys)
        else:
            planes2d = _ce_xla_asc(planes2d, grp[0], n_keys)
        i += len(grp)
    Rb = B // _LANES
    spec = pl.BlockSpec((Rb, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dtypes = [p.dtype for p in planes2d]
    outs = pl.pallas_call(
        _merge_tail_kernel(len(planes2d), _log2(B), n_keys),
        grid=(n // B,),
        in_specs=[spec] * len(planes2d),
        out_specs=[spec] * len(planes2d),
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), dt) for dt in dtypes],
        interpret=interpret,
    )(*planes2d)
    return [o.reshape(-1) for o in outs]


def _merge_u48(a_t, a_b, b_t, b_b):
    """Merge two ascending (t u32, b u16) streams (lexicographic (t, b)
    order == u64 order of the 2k-bit value; duplicates allowed)."""
    n = a_t.shape[0] + b_t.shape[0]
    if not (use_pallas_sort() and _pallas_ok(n, 1 << 62)):
        return jax.lax.sort(
            (jnp.concatenate([a_t, b_t]), jnp.concatenate([a_b, b_b])),
            num_keys=2,
        )
    interpret = jax.default_backend() != "tpu"
    return tuple(_merge_halves_mixed([a_t, a_b], [b_t, b_b], interpret=interpret))


@jax.jit
def merge_sorted_streams_u48(a_t, a_b, b_t, b_b):
    """Jitted entry point for the forest merges (one standalone program
    per size pair, mirroring sort_pallas.merge_sorted_streams)."""
    return _merge_u48(a_t, a_b, b_t, b_b)


@partial(jax.jit, static_argnames=("k",))
def sort_canonical_packed_u48_n16(lanes: jnp.ndarray, invalid_words: jnp.ndarray, k: int):
    """sort_canonical_packed_u48 WITHOUT the u32 widening: returns
    (t_sorted u32, b_sorted u16, n_valid) so the caller's merge forest
    carries 6 bytes/element.  Internal chunk merges use the mixed-dtype
    Pallas path too (the widened original merges u32 pairs even inside
    the batch program).  Masked slots carry (SENTINEL, 0xFFFF), which is
    exactly the u16 image of the widened sentinel pair: a REAL value can
    never have t == SENTINEL for k <= 24 (see ops/count._widen_b16)."""
    from . import count as _count
    from .kmers_lanes import extract_canonical_lanes

    assert 32 < 2 * k <= 48, k
    chunk = _count.CHUNK_POSITIONS
    n_positions = lanes.shape[0] * 16
    hi, lo, valid = extract_canonical_lanes(lanes, invalid_words, k, n_positions)
    t, b = narrow_u48(hi.reshape(-1), lo.reshape(-1), k)
    valid = valid.reshape(-1)
    t = jnp.where(valid, t, SENTINEL)
    b16 = jnp.where(valid, b, 0xFFFF).astype(U16)
    n_valid = valid.astype(jnp.int32).sum()
    from .sort_tiled import sort_u48_tiled, tiled_sort_enabled

    if tiled_sort_enabled():
        # whole-batch tiled mixed sort (ops/sort_tiled.py); the u16
        # plane stays narrow straight into the forest
        st, sb = sort_u48_tiled(t, b16)
        return st, sb, n_valid
    if n_positions % chunk != 0 or n_positions <= chunk:
        st, sb = jax.lax.sort((t, b16), num_keys=2)
        return st, sb, n_valid

    n_chunks = n_positions // chunk

    def chunk_body(_, xs):
        ct, cb = xs
        return (), jax.lax.sort((ct, cb), num_keys=2)

    _, (st, sb) = jax.lax.scan(
        chunk_body,
        (),
        (t.reshape(n_chunks, chunk), b16.reshape(n_chunks, chunk)),
    )
    runs = [(st[i], sb[i]) for i in range(n_chunks)]
    while len(runs) > 1:
        merged = [
            _merge_u48(a[0], a[1], b_[0], b_[1])
            for a, b_ in zip(runs[0::2], runs[1::2])
        ]
        if len(runs) % 2:
            merged.append(runs[-1])
        runs = merged
    return runs[0][0], runs[0][1], n_valid


@jax.jit
def rle_compact_u48(st: jnp.ndarray, sb16: jnp.ndarray, n_valid):
    """Run-length encode a sorted (t u32, b u16) stream: widen b to u32
    once, in-program (one fused elementwise pass -- the flush runs once
    per epoch, so the widening is amortized across every merge the run
    survived), then reuse the scatter-free RLE verbatim.  Returns
    (ut u32, ub u32, counts, n_unique) -- u32 planes so the downstream
    fold/combine/spill path is shared with the widened pipeline."""
    return _rle_sorted(st, _widen_b16(st, sb16), n_valid)
