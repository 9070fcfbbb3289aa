"""Pallas TPU kernels for the scatter-free counting pipeline.

Three families, all built from compare-exchange / conditional-shift
passes on (rows, 128) planes of u32:

* **Bitonic merge** (merge_sorted_streams / merge_sorted_pairs): merging
  two sorted runs needs only the log2(n) all-ascending stages of a
  bitonic merge, not a full re-sort -- ~6x faster than lax.sort with a
  payload.  Big strides run fused in groups of up to three per kernel
  (2^m XOR-offset block views in, DMA block writes out); the low-stride
  tail runs in one gridded VMEM kernel.
* **Monotone-shift compaction** (compact_left_pallas): kept elements
  move left by (#dropped before them) -- non-decreasing shifts with
  distinct destinations decompose into log2(n) conditional fixed-offset
  passes, LSB-first (collision-freedom validated against a numpy
  oracle).  Bits 0..14 (combined span < one 2^15 block) run as three
  5-pass window kernels with stale-copy freezing; the remaining bits
  collapse into ONE source-driven block-placement kernel (residual
  shifts are exact block multiples, each source block feeds at most two
  consecutive destination blocks).
* **Monolithic bitonic sort** (sort_pairs): a full in-VMEM network,
  kept for n <= 2^14 only -- Mosaic compile time scales with unrolled
  stages x sublane rows (2^14 compiles in ~17 s, 2^16 DNF in 10 min),
  and a compile-feasible tiled variant only matches lax.sort, so chunk
  sorts stay on lax.sort.

Off-TPU the public wrappers fall back to jax.lax.sort (bit-identical
semantics); the Pallas paths run under interpret=True in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_LANES = 128
# Single-kernel size cap for the full monolithic sort (elements).
# Mosaic compile time scales roughly with unrolled stages x sublane
# rows: a 2^14 network (91 stages on (128,128)) compiles in ~17 s, a
# 2^16 one does not finish in 10 min.  The monolith is therefore OFF by
# default (lax.sort is used for chunk sorts); the merge path below uses
# few stages on small blocks and compiles quickly.
MAX_SORT_N = 1 << 14
# Per-grid-block size for the tiled merge tail (3 planes live in VMEM;
# 16 stages on (512,128) blocks keeps the Mosaic program small).
MERGE_BLOCK = 1 << 16


def _log2(n: int) -> int:
    b = n.bit_length() - 1
    assert 1 << b == n, f"not a power of two: {n}"
    return b


def _lex_gt(a_hi, a_lo, b_hi, b_lo):
    """(a_hi, a_lo) > (b_hi, b_lo) as unsigned 64-bit."""
    return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo > b_lo))


def _gt(a_planes, b_planes, n_keys):
    if any(p.dtype.itemsize < 4 for p in a_planes[:n_keys]):  # Mosaic has no
        a_planes = [p.astype(U32) for p in a_planes[:n_keys]]  # 16-bit compare:
        b_planes = [p.astype(U32) for p in b_planes[:n_keys]]  # widen in-register
    if n_keys == 1:
        return a_planes[0] > b_planes[0]
    return _lex_gt(a_planes[0], a_planes[1], b_planes[0], b_planes[1])


def _ce_rows(planes, s: int, desc_mask_fn, n_keys: int = 2):
    """Compare-exchange at row stride s (< R) on (R, 128) planes.

    desc_mask_fn(g_iota (G,1,1,1), lane_iota (1,1,1,128)) -> bool mask,
    True where the pair's block sorts descending.  Returns new planes.
    """
    R = planes[0].shape[0]
    G = R // (2 * s)
    views = [p.reshape(G, 2, s, _LANES) for p in planes]
    a = [v[:, 0] for v in views]  # (G, s, 128), lower logical index
    b = [v[:, 1] for v in views]
    gt = _gt(a, b, n_keys)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANES), 2)
    desc = desc_mask_fn(g_iota, l_iota)
    swap = gt ^ desc  # on equal keys gt=False: swap in desc blocks is harmless
    out = []
    for pa, pb in zip(a, b):
        na = jnp.where(swap, pb, pa)
        nb = jnp.where(swap, pa, pb)
        out.append(jnp.stack([na, nb], axis=1).reshape(R, _LANES))
    return out


def _ce_lanes(planes, e: int, desc_mask_fn, n_keys: int = 2):
    """Compare-exchange at lane stride e (partner lane = lane XOR e).

    desc_mask_fn(lane_iota (1,128)) -> bool mask of descending blocks.
    """
    R = planes[0].shape[0]
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    is_low = (l_iota & e) == 0  # this lane holds the lower logical index
    partners = []
    for p, w in ((q, q if q.dtype.itemsize >= 4 else q.astype(U32)) for q in planes):
        fwd = pltpu.roll(w, _LANES - e, 1)  # value from lane + e
        bwd = pltpu.roll(w, e, 1)  # value from lane - e
        partners.append(jnp.where(is_low, fwd, bwd).astype(p.dtype))
    lo_hi = [jnp.where(is_low, p, q) for p, q in zip(planes, partners)]
    hi_hi = [jnp.where(is_low, q, p) for p, q in zip(planes, partners)]
    gt = _gt(lo_hi, hi_hi, n_keys)
    desc = desc_mask_fn(l_iota)
    # swap is identical on both lanes of a pair (gt is computed on the
    # same (low, high) values and the direction bit p > j is shared), so
    # each lane just takes its partner's value when swapping
    swap = gt ^ desc
    return [jnp.where(swap, q, p) for p, q in zip(planes, partners)]


def _bitonic_stage(planes, p: int, j: int, logR: int, n_keys: int = 2):
    """One compare-exchange stage: pass p (block 2^p), stride 2^j.

    Logical index i = lane * R + row.  Direction: block descending iff
    bit p of i is set (final pass p == log2(n) has bit p always 0 =>
    all ascending).  Bit b of i is row bit b when b < logR, else lane
    bit (b - logR).
    """
    s = 1 << j
    R = planes[0].shape[0]
    if s < R:
        if p < logR:
            # direction bit is a row bit; within the (G, 2, s) row view,
            # row = g*2s + h*s + r, so bit p (>= j+1) is bit (p-j-1) of g
            def desc(g_iota, l_iota):
                return ((g_iota >> (p - j - 1)) & 1) == 1
        else:

            def desc(g_iota, l_iota):
                return ((l_iota >> (p - logR)) & 1) == 1

        return _ce_rows(planes, s, desc, n_keys)
    else:
        e = s // R  # lane distance

        def desc(l_iota):
            return ((l_iota >> (p - logR)) & 1) == 1

        return _ce_lanes(planes, e, desc, n_keys)


def _sort_kernel(n_planes: int, logn: int, logR: int, merge_only: bool, n_keys: int = 2):
    def kernel(*refs):
        planes = [r[:] for r in refs[:n_planes]]
        outs = refs[n_planes:]
        if merge_only:
            # input = ascending run ++ reversed ascending run (bitonic);
            # a single merge pass, all ascending
            for j in range(logn - 1, -1, -1):
                planes = _bitonic_stage(planes, logn, j, logR, n_keys)
        else:
            for p in range(1, logn + 1):
                for j in range(p - 1, -1, -1):
                    planes = _bitonic_stage(planes, p, j, logR, n_keys)
        for o, pl_ in zip(outs, planes):
            o[:] = pl_

    return kernel


def _run_network(planes, merge_only: bool, interpret: bool, n_keys: int = 2):
    n = planes[0].shape[0]
    logn = _log2(n)
    R = n // _LANES
    logR = _log2(R)
    if merge_only:
        # the network operates in column-major logical order; a merge
        # (unlike a full sort) needs the input's bitonic structure
        # preserved in that order, so lay it out column-major first
        planes2d = [p.reshape(_LANES, R).T for p in planes]
    else:
        # sorting is permutation-invariant: reinterpret memory directly
        planes2d = [p.reshape(R, _LANES) for p in planes]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _sort_kernel(len(planes), logn, logR, merge_only, n_keys),
        in_specs=[spec] * len(planes),
        out_specs=[spec] * len(planes),
        out_shape=[jax.ShapeDtypeStruct((R, _LANES), U32)] * len(planes),
        interpret=interpret,
    )(*planes2d)
    # logical column-major -> flat ascending order
    return [o.T.reshape(-1) for o in outs]


def _ce_xla_asc(planes2d, s: int, n_keys: int = 2):
    """XLA compare-exchange at element stride s (>= 128), all ascending.

    planes2d are (rows, 128) views of the flat sequence (logical index =
    row*128 + lane).  The reshape touches leading dims only, keeping the
    minor-dim layout at 128 lanes -- reshaping to flat (G, 2, s) shapes
    instead makes XLA relayout every stage (~10x slower, measured).
    Only the low-stride tail (where VMEM reuse across stages pays) goes
    to Pallas.
    """
    R = planes2d[0].shape[0]
    d = s // _LANES
    G = R // (2 * d)
    views = [p.reshape(G, 2, d, _LANES) for p in planes2d]
    a = [v[:, 0] for v in views]
    b = [v[:, 1] for v in views]
    gt = _gt(a, b, n_keys)
    out = []
    for pa, pb in zip(a, b):
        na = jnp.where(gt, pb, pa)
        nb = jnp.where(gt, pa, pb)
        out.append(jnp.stack([na, nb], axis=1).reshape(R, _LANES))
    return out


def _ce_fused_kernel(n_planes: int, n_strides: int, bit_offs, positions, n_keys: int = 2):
    """Fused ascending compare-exchange for up to 3 merge strides.

    2^m views of each plane arrive (BlockSpec-pipelined) at XOR block
    offsets {0, a1} x {0, a2} x {0, a3}; the kernel runs the CE cascade
    highest stride first across the views in VMEM, then DMA-writes every
    block back to ANY-space outputs -- one read + one write per element
    per m strides instead of per stride.  Grid steps write disjoint
    block sets, so the dynamic-offset DMAs never overlap.
    """
    V = 1 << n_strides
    Rb = COMPACT_BLOCK_ROWS  # merge block rows == 2^15 elements

    def kernel(*refs):
        views = [
            [refs[v * n_planes + p][:] for p in range(n_planes)] for v in range(V)
        ]
        outs = refs[V * n_planes : V * n_planes + n_planes]
        scratch = refs[V * n_planes + n_planes : -1]
        sems = refs[-1]
        # strides ordered highest first = combo bit (m-1) first
        for bit in range(n_strides - 1, -1, -1):
            step = 1 << bit
            for v in range(V):
                if v & step:
                    continue
                a, b = views[v], views[v + step]
                gt = _gt(a, b, n_keys)
                views[v] = [jnp.where(gt, q, p) for p, q in zip(a, b)]
                views[v + step] = [jnp.where(gt, p, q) for p, q in zip(a, b)]
        g = pl.program_id(0)
        base = g
        for p in positions:
            low = base & ((1 << p) - 1)
            base = ((base >> p) << (p + 1)) | low
        copies = []
        for v in range(V):
            off = 0
            for j in range(n_strides):
                if v & (1 << j):
                    off += bit_offs[j]
            row0 = (base + off) * Rb
            for p in range(n_planes):
                sc = scratch[v * n_planes + p]
                sc[:] = views[v][p]
                dma = pltpu.make_async_copy(
                    sc, outs[p].at[pl.ds(row0, Rb)], sems.at[v * n_planes + p]
                )
                dma.start()
                copies.append(dma)
        for dma in copies:
            dma.wait()

    return kernel


def _ce_fused_call(planes2d, strides, interpret: bool, n_keys: int = 2):
    """Run up to 3 ascending CE stages in one Pallas kernel.

    strides: descending powers of two (elements), each a multiple of
    MERGE_BLOCK and each dividing the array size.
    """
    rows = planes2d[0].shape[0]
    n_planes = len(planes2d)
    Rb = COMPACT_BLOCK_ROWS
    nblocks = rows // Rb
    m = len(strides)
    offs = [s // (Rb * _LANES) for s in strides]  # block offsets, descending
    bit_offs = [offs[m - 1 - j] for j in range(m)]  # combo bit j -> offset
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
    outs = pl.pallas_call(
        _ce_fused_kernel(n_planes, m, bit_offs, positions, n_keys),
        grid=(nblocks >> m,),
        in_specs=specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_planes,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), U32)] * n_planes,
        scratch_shapes=[pltpu.VMEM((Rb, _LANES), U32)] * (V * n_planes)
        + [pltpu.SemaphoreType.DMA((V * n_planes,))],
        interpret=interpret,
    )(*args)
    return list(outs)


def _merge_tail_kernel(n_planes: int, logB: int, n_keys: int = 2):
    """Gridded Pallas kernel: ascending bitonic merge of each block.

    Blocks are contiguous flat slices; logical order inside a block is
    plain row-major (= flat order), so no transposes are needed: strides
    >= 128 are sublane reshapes, strides < 128 are lane rolls.
    """

    def no_desc_rows(g_iota, l_iota):
        return jnp.zeros((), jnp.bool_)

    def no_desc_lanes(l_iota):
        return jnp.zeros((), jnp.bool_)

    def kernel(*refs):
        planes = [r[:] for r in refs[:n_planes]]
        for j in range(logB - 1, -1, -1):
            s = 1 << j
            if s >= _LANES:
                planes = _ce_rows(planes, s // _LANES, no_desc_rows, n_keys)
            else:
                planes = _ce_lanes(planes, s, no_desc_lanes, n_keys)
        for o, p in zip(refs[n_planes:], planes):
            o[:] = p

    return kernel


def _merge_halves(a_planes, b_planes, interpret: bool, n_keys: int = 2):
    """Merge two ascending runs a (len na) and b (len nb), na+nb = 2^m.

    Works directly on the bitonic-split recursion: the first stage pairs
    a[i] with reversed-b[i]; both the min-half and the max-half of a
    bitonic split are themselves bitonic in stored order, so no materialized
    reversal of b or re-reversal of the upper half is ever needed.
    """
    n = a_planes[0].shape[0] + b_planes[0].shape[0]
    rows = n // _LANES
    # first stage: elementwise a vs flipped b (flip fuses into the select)
    na = a_planes[0].shape[0]
    if na != n // 2:
        # unequal split: fall back to a materialized bitonic sequence
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
    # the merge-tail kernel's scoped-VMEM stack grows with plane count x
    # block rows: 5 planes at 2^16 blocks exceeds the 16 MB limit
    # (measured: 16.57M on classify_join), so wide-plane merges halve
    # the block (twice the grid steps, same total traffic)
    merge_block = MERGE_BLOCK if len(planes2d) <= 4 else MERGE_BLOCK // 2
    B = min(n, merge_block)
    strides = []
    while s >= B:
        strides.append(s)
        s //= 2
    # fused group size is VMEM-bound: 2^m views + scratch of every plane
    # must fit (~12 MB budget of 16 MB/core); 3 strides for <= 2 planes,
    # 2 strides at 3-4 planes
    max_group = 3 if len(planes2d) <= 2 else 2
    i = 0
    while i < len(strides):
        grp = strides[i : i + max_group]
        if len(grp) >= 2:
            planes2d = _ce_fused_call(planes2d, grp, interpret, n_keys)
        else:
            planes2d = _ce_xla_asc(planes2d, grp[0], n_keys)
        i += len(grp)
    Rb = B // _LANES
    spec = pl.BlockSpec((Rb, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _merge_tail_kernel(len(planes2d), _log2(B), n_keys),
        grid=(n // B,),
        in_specs=[spec] * len(planes2d),
        out_specs=[spec] * len(planes2d),
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), U32)] * len(planes2d),
        interpret=interpret,
    )(*planes2d)
    return [o.reshape(-1) for o in outs]


COMPACT_BLOCK_ROWS = 256  # 2^15 elements per grid block
STALE_S = 1 << 30  # frozen stale-copy shift marker (all tested bits clear)


def _ce_shift(window_planes, m: int, base_pos, n: int, freeze: bool = False):
    """One compaction pass on a row-window: every slot takes its partner
    at +m elements iff bit log2(m) of the partner's shift plane (last
    plane) is set and the partner is in range.  base_pos = global element
    index of the window's first cell.  Rows near the window top read
    wrapped garbage; callers account for the shrinking valid region.

    With freeze=True a slot whose occupant departs un-overwritten gets
    shift STALE_S, so stale copies never move again and the placement
    stage can identify live cells (validated against a numpy oracle).
    """
    rows = window_planes[0].shape[0]
    if m >= _LANES:
        dr = m // _LANES
        partners = [
            jnp.concatenate([w[dr:], w[:dr]]) for w in window_planes
        ]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        partners = []
        for w in window_planes:
            ra = pltpu.roll(w, _LANES - m, 1)
            nxt = jnp.concatenate([ra[1:], ra[:1]])
            partners.append(jnp.where(lane < _LANES - m, ra, nxt))
    s_part = partners[-1].astype(jnp.int32)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    pos = base_pos + r_iota * _LANES + l_iota
    recv = ((s_part & m) != 0) & (pos + m < n)
    out = [jnp.where(recv, p, w) for p, w in zip(partners[:-1], window_planes[:-1])]
    s_self = window_planes[-1].astype(jnp.int32)
    if freeze:
        s_keep = jnp.where((s_self & m) != 0, STALE_S, s_self)
    else:
        s_keep = s_self
    out.append(jnp.where(recv, s_part - m, s_keep))
    return out


def _compact_window_kernel(n_planes: int, b0: int, b1: int, n: int, freeze: bool):
    """Fused low-bit passes b0..b1 (total shift < one block): reads the
    2-block window once, runs all passes in VMEM, writes block i.  Cuts
    the per-pass HBM round trips of the low bits to a single one."""
    Rb = COMPACT_BLOCK_ROWS
    P1 = n_planes + 1

    def kernel(*refs):
        selfs = [r[:] for r in refs[:P1]]
        nxts = [r[:] for r in refs[P1 : 2 * P1]]
        outs = refs[2 * P1 :]
        window = [jnp.concatenate([a, b]) for a, b in zip(selfs, nxts)]
        i = pl.program_id(0)
        base = i * Rb * _LANES
        for b in range(b0, b1 + 1):
            window = _ce_shift(window, 1 << b, base, n, freeze=freeze)
        for j in range(P1):
            outs[j][:] = window[j][:Rb].astype(outs[j].dtype)

    return kernel


def _compact_window_call(planes, s, b0: int, b1: int, interpret: bool, freeze: bool = False):
    rows = planes[0].shape[0]
    n = rows * _LANES
    P1 = len(planes) + 1
    Rb = COMPACT_BLOCK_ROWS
    nb = rows // Rb
    blk_self = pl.BlockSpec((Rb, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk_next = pl.BlockSpec(
        (Rb, _LANES), lambda i: (jnp.minimum(i + 1, nb - 1), 0), memory_space=pltpu.VMEM
    )
    args = list(planes) + [s]
    outs = pl.pallas_call(
        _compact_window_kernel(len(planes), b0, b1, n, freeze),
        grid=(nb,),
        in_specs=[blk_self] * P1 + [blk_next] * P1,
        out_specs=[blk_self] * P1,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), U32)] * len(planes)
        + [jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)],
        interpret=interpret,
    )(*args, *args)
    return list(outs[: len(planes)]), outs[len(planes)]


def _placement_kernel(n_planes: int, logB: int, nb: int):
    """Final compaction stage: after the low-bit passes (with freezing),
    every live cell's residual shift is an exact multiple of the block
    size, cell positions within blocks are preserved, and each source
    block's live cells map to at most TWO consecutive destination blocks
    (their ranks are contiguous).  Each grid step reads its source block
    and read-modify-writes its two candidate destination blocks in the
    ANY-space outputs; the sequential grid orders overlapping RMWs and
    distinct live sources never collide on a destination cell
    (numpy-validated).
    """
    Rb = COMPACT_BLOCK_ROWS

    def kernel(d1_ref, *refs):
        srcs = [r[:] for r in refs[:n_planes]]
        s_blk = refs[n_planes][:].astype(jnp.int32)
        outs = refs[n_planes + 1 : 2 * n_planes + 1]
        scratch = refs[2 * n_planes + 1 : 3 * n_planes + 1]
        sems = refs[3 * n_planes + 1]
        b = pl.program_id(0)
        rb = s_blk >> logB
        live = s_blk < STALE_S
        d1 = d1_ref[b]
        for j in range(2):
            d = d1 + j

            @pl.when((d >= 0) & (d < nb))
            def _():
                row0 = d * Rb
                for p in range(n_planes):
                    pltpu.make_async_copy(
                        outs[p].at[pl.ds(row0, Rb)], scratch[p], sems.at[p]
                    ).start()
                for p in range(n_planes):
                    pltpu.make_async_copy(
                        outs[p].at[pl.ds(row0, Rb)], scratch[p], sems.at[p]
                    ).wait()
                sel = live & (b - rb == d)
                for p in range(n_planes):
                    scratch[p][:] = jnp.where(sel, srcs[p], scratch[p][:])
                for p in range(n_planes):
                    pltpu.make_async_copy(
                        scratch[p], outs[p].at[pl.ds(row0, Rb)], sems.at[p]
                    ).start()
                for p in range(n_planes):
                    pltpu.make_async_copy(
                        scratch[p], outs[p].at[pl.ds(row0, Rb)], sems.at[p]
                    ).wait()

    return kernel


def _placement_call(planes, s, interpret: bool):
    """Run the block-placement stage; returns compacted planes (tail
    garbage past the kept count, callers mask)."""
    rows = planes[0].shape[0]
    n = rows * _LANES
    P = len(planes)
    Rb = COMPACT_BLOCK_ROWS
    nb = rows // Rb
    logB = _log2(Rb * _LANES)
    rb = jnp.where(s < STALE_S, s >> logB, -1)
    rbmax = rb.reshape(nb, -1).max(axis=1)
    d1 = jnp.where(
        rbmax >= 0, jnp.arange(nb, dtype=jnp.int32) - rbmax, jnp.int32(-2)
    )
    blk = pl.BlockSpec(
        (Rb, _LANES), lambda b, d1_ref: (b, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[blk] * (P + 1),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * P,
        scratch_shapes=[pltpu.VMEM((Rb, _LANES), U32)] * P
        + [pltpu.SemaphoreType.DMA((P,))],
    )
    outs = pl.pallas_call(
        _placement_kernel(P, logB, nb),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), U32)] * P,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(d1, *planes, s)
    return list(outs)


def compact_left_pallas(planes, keep):
    """Pallas-fused monotone-shift compaction (ops.count._compact_left
    semantics): kept elements move to the front stably; tail slots hold
    leftovers the caller must mask.

    Pass schedule: bits 0..14 (shift span < one 2^15 block) run as three
    window kernels of five fused passes each with stale-copy freezing --
    one HBM round trip per kernel instead of per pass -- after which
    every live cell's residual shift is an exact block multiple, and a
    single block-placement kernel (source-driven RMW of at most two
    destination blocks per source) finishes the job.  ~3x less HBM
    traffic than one kernel per pass.
    """
    n = keep.shape[0]
    rows = n // _LANES
    drop = (~keep).astype(jnp.int32)
    s = jnp.cumsum(drop) - drop
    planes2 = [p.reshape(rows, _LANES) for p in planes]
    s2 = s.reshape(rows, _LANES)
    interpret = jax.default_backend() != "tpu"
    log_blk = _log2(COMPACT_BLOCK_ROWS * _LANES)
    logn = _log2(n)
    b = 0
    while b < min(log_blk, logn):
        b1 = min(b + 4, min(log_blk, logn) - 1)
        planes2, s2 = _compact_window_call(
            planes2, s2, b, b1, interpret, freeze=True
        )
        b = b1 + 1
    if logn > log_blk:
        planes2 = _placement_call(planes2, s2, interpret)
    return [p.reshape(-1) for p in planes2]


def use_compact_pallas(n: int) -> bool:
    if not use_pallas_sort():
        return False
    block = COMPACT_BLOCK_ROWS * _LANES
    return (
        jax.default_backend() == "tpu"
        and (n & (n - 1)) == 0  # the pass ladder asserts a pow2 size
        and n % block == 0
        and n >= 2 * block
    )


def _pallas_ok(n: int, cap: int) -> bool:
    return n >= (1 << 14) and (n & (n - 1)) == 0 and n <= cap


def use_pallas_sort() -> bool:
    import os

    if os.environ.get("ORION_KMER_PALLAS_SORT", "1") == "0":
        return False
    return True


@jax.jit
def sort_pairs(hi: jnp.ndarray, lo: jnp.ndarray):
    """Ascending lexicographic sort of (hi, lo) u32 pairs (u64 order).

    Pallas bitonic network on TPU for power-of-two sizes within the
    single-kernel cap; jax.lax.sort otherwise.
    """
    n = hi.shape[0]
    if not (use_pallas_sort() and _pallas_ok(n, MAX_SORT_N)):
        return jax.lax.sort((hi, lo), num_keys=2)
    interpret = jax.default_backend() != "tpu"
    shi, slo = _run_network([hi, lo], merge_only=False, interpret=interpret)
    return shi, slo


def merge_sorted_planes(a_planes, b_planes, n_keys: int = 2):
    """Merge two ascending-sorted plane tuples (keys = the first
    ``n_keys`` planes: 2 = u64 as a (hi, lo) pair, 1 = single u32;
    further planes are payload).  Pallas bitonic merge when the total is
    a power of two within range, lax.sort otherwise.  Payload order
    within equal keys is unspecified (bitonic merges are not stable)."""
    n = a_planes[0].shape[0] + b_planes[0].shape[0]
    if not (use_pallas_sort() and _pallas_ok(n, 1 << 62)):
        cat = [
            jnp.concatenate([a, b]).astype(U32)
            for a, b in zip(a_planes, b_planes)
        ]
        out = jax.lax.sort(tuple(cat), num_keys=n_keys)
        return [
            o.astype(p.dtype) for o, p in zip(out, a_planes)
        ]
    interpret = jax.default_backend() != "tpu"
    a32 = [p.astype(U32) for p in a_planes]
    b32 = [p.astype(U32) for p in b_planes]
    out = _merge_halves(a32, b32, interpret=interpret, n_keys=n_keys)
    return [o.astype(p.dtype) for o, p in zip(out, a_planes)]


@jax.jit
def merge_sorted_streams(a_hi, a_lo, b_hi, b_lo):
    """Merge two ascending-sorted (hi, lo) streams (duplicates allowed).

    2-plane variant of merge_sorted_pairs for raw weight-1 k-mer streams
    (the count pipeline defers run-length encoding to the flush, because
    RLE's scatters cost far more than carrying duplicates through the
    bandwidth-bound merges).
    """
    n = a_hi.shape[0] + b_hi.shape[0]
    if not (use_pallas_sort() and _pallas_ok(n, 1 << 62)):
        return jax.lax.sort(
            (jnp.concatenate([a_hi, b_hi]), jnp.concatenate([a_lo, b_lo])),
            num_keys=2,
        )
    interpret = jax.default_backend() != "tpu"
    return tuple(_merge_halves([a_hi, a_lo], [b_hi, b_lo], interpret=interpret))


@jax.jit
def merge_sorted_single(a, b):
    """Merge two ascending-sorted single-u32-plane streams.

    The 2k <= 32 pipeline specialization: one u32 holds the whole
    canonical k-mer (ops/kmers.py:155-157 -- the hi plane is identically
    zero for k <= 16), so sorts, merges, and RLE carry HALF the HBM
    traffic of the (hi, lo) pair path.
    """
    n = a.shape[0] + b.shape[0]
    if not (use_pallas_sort() and _pallas_ok(n, 1 << 62)):
        return jax.lax.sort((jnp.concatenate([a, b]),), num_keys=1)[0]
    interpret = jax.default_backend() != "tpu"
    return _merge_halves([a], [b], interpret=interpret, n_keys=1)[0]


@jax.jit
def merge_sorted_pairs(a_hi, a_lo, a_cnt, b_hi, b_lo, b_cnt):
    """Merge two ascending-sorted weighted runs (any length split).

    Inputs are sorted ascending by (hi, lo) with int32 counts (sentinel
    padding sorts to the end).  a ++ reversed(b) is bitonic, so a single
    bitonic-merge pass (log n all-ascending stages, no direction masks)
    sorts it -- ~10x fewer stages than the full lax.sort it replaces.
    Returns the merged ascending triple of length len(a) + len(b).
    """
    n = a_hi.shape[0] + b_hi.shape[0]
    if not (use_pallas_sort() and _pallas_ok(n, 1 << 62)):
        shi, slo, scnt = jax.lax.sort(
            (
                jnp.concatenate([a_hi, b_hi]),
                jnp.concatenate([a_lo, b_lo]),
                jnp.concatenate([a_cnt, b_cnt]),
            ),
            num_keys=2,
        )
        return shi, slo, scnt
    interpret = jax.default_backend() != "tpu"
    shi, slo, scnt = _merge_halves(
        [a_hi, a_lo, a_cnt.astype(U32)],
        [b_hi, b_lo, b_cnt.astype(U32)],
        interpret=interpret,
    )
    return shi, slo, scnt.astype(jnp.int32)
