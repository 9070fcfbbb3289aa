"""Tiled mixed-dtype full sort for the 32 < 2k <= 48 chunk sorts
(VERDICT r3 item 5: the k=21 batch sort is priced like k=31 because
XLA's lax.sort pads a u16 operand to u32 -- measured on-chip: sorting
(u32, u16) costs the same per element as (u32, u32)).

This module sorts the narrowed (t u32, b u16) pair moving an HONEST
6 bytes/element through every stage:

  1. **Block sorts**: one gridded Pallas kernel runs the full bitonic
     network on 2^14-element VMEM blocks (91 stages -- the monolith
     compile bound from ops/sort_pallas.py; compile scales with
     unrolled stages, so blocks stay at 2^14).  Mixed planes live in
     VMEM at their native dtypes.
  2. **Merge tree**: log2(n / 2^14) levels of pairwise bitonic merges.
     Each level is ONE vmapped merge over the pair axis -- a vmap-safe
     variant of sort_pallas._merge_halves that replaces the fused
     multi-stride kernel (whose program_id arithmetic does not commute
     with vmap's added grid axis) with per-stride XLA compare-exchanges
     feeding the single gridded VMEM tail kernel.  The whole sort
     carries ~9 Mosaic kernel instances, keeping executable LOAD time
     (~30-45 s per Mosaic-bearing program on this tunneled backend,
     re-lowered per instance) in check.

A prior tiled experiment on u32 pairs only MATCHED lax.sort
(sort_pallas.py:21-25) -- the wager here is the 8->6 byte cut, not a
better network, hence the expected ~1.3x on the chunk sort and the
microbench gate (tools/bench_sort.py) before any default flips.

STATUS: gated by ORION_KMER_TILED_SORT (default off).  Correct under
interpret mode and the lax.sort fallback (tests/test_sort_tiled.py);
Mosaic v5e lacks 16-bit vector compare and u16 pltpu.roll
(tools/probe_u16_mosaic.py) -- both handled by the in-register widening
in sort_pallas._gt/_ce_lanes (u16 transpose lowers fine).  Gate on
tools/bench_sort.py (>= 1.3x vs lax.sort (u32,u16)) before any flip.

Reference parity: output ordering is the count determinism anchor
(orion-kmer/src/commands/count.rs:119 -- ascending encoded-u64 order);
bitonic networks are unstable, which is safe here because the streams
carry no payload (equal keys are indistinguishable).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_pallas import (
    _LANES,
    MERGE_BLOCK,
    _bitonic_stage,
    _ce_xla_asc,
    _gt,
    _log2,
    _merge_tail_kernel,
    use_pallas_sort,
)

_BLK = 1 << 14  # elements per VMEM block sort (Mosaic compile bound)
_BLK_ROWS = _BLK // _LANES  # 128 -> square (128, 128) planes


def tiled_sort_enabled() -> bool:
    """ORION_KMER_TILED_SORT=1 switches u48 chunk sorts to the tiled
    mixed-dtype path.  Off by default until tools/bench_sort.py proves
    >= 1.3x on-chip AND the Mosaic u16 path validates (vfy_u16.sh)."""
    return os.environ.get("ORION_KMER_TILED_SORT", "0") == "1"


def _block_sort_kernel(n_planes: int, n_keys: int):
    """Full bitonic network on one (128, 128) VMEM block per grid step.

    The network's logical index is column-major (i = lane * R + row);
    a full sort is input-permutation-invariant so blocks load as plain
    row-major memory, and the final transpose (square planes) lands the
    ascending order in flat row-major layout -- no host-side transpose.
    """
    logn = _log2(_BLK)
    logR = _log2(_BLK_ROWS)

    def kernel(*refs):
        planes = [r[:] for r in refs[:n_planes]]
        for p in range(1, logn + 1):
            for j in range(p - 1, -1, -1):
                planes = _bitonic_stage(planes, p, j, logR, n_keys)
        for o, pp in zip(refs[n_planes:], planes):
            o[:] = pp.T

    return kernel


def _block_sort_call(planes, interpret: bool, n_keys: int = 2):
    """Sort every 2^14-element block of the flat planes independently."""
    n = planes[0].shape[0]
    rows = n // _LANES
    nblk = n // _BLK
    planes2d = [p.reshape(rows, _LANES) for p in planes]
    spec = pl.BlockSpec(
        (_BLK_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        _block_sort_kernel(len(planes), n_keys),
        grid=(nblk,),
        in_specs=[spec] * len(planes),
        out_specs=[spec] * len(planes),
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), p.dtype) for p in planes],
        interpret=interpret,
    )(*planes2d)
    return [o.reshape(-1) for o in outs]


def _merge_level_one(a_planes, b_planes, interpret: bool, n_keys: int = 2):
    """Merge one pair of equal-length ascending runs, vmap-safely.

    Identical to sort_pallas._merge_halves except every stride >= the
    tail block runs as an XLA compare-exchange (_ce_xla_asc) instead of
    the fused dynamic-DMA kernel: _ce_fused_kernel derives block
    offsets from pl.program_id(0), which vmap repurposes as the batch
    axis.  The XLA strides cost one extra HBM round trip each at the
    top levels -- bounded, and worth the single-Mosaic-instance-per-
    level program this buys on a backend where each instance re-lowers
    at executable load.
    """
    n = a_planes[0].shape[0] + b_planes[0].shape[0]
    rows = n // _LANES
    # first stage fused into the select: a vs flipped b, both halves of
    # the bitonic split are bitonic in stored order
    a2 = [p.reshape(rows // 2, _LANES) for p in a_planes]
    rb = [jnp.flip(p.reshape(rows // 2, _LANES), (0, 1)) for p in b_planes]
    gt = _gt(a2, rb, n_keys)
    planes2d = [
        jnp.concatenate([jnp.where(gt, q, p), jnp.where(gt, p, q)])
        for p, q in zip(a2, rb)
    ]
    s = n // 4
    B = min(n, MERGE_BLOCK)
    while s >= B:
        planes2d = _ce_xla_asc(planes2d, s, n_keys)
        s //= 2
    Rb = B // _LANES
    spec = pl.BlockSpec((Rb, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _merge_tail_kernel(len(planes2d), _log2(B), n_keys),
        grid=(n // B,),
        in_specs=[spec] * len(planes2d),
        out_specs=[spec] * len(planes2d),
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), p.dtype) for p in planes2d
        ],
        interpret=interpret,
    )(*planes2d)
    return [o.reshape(-1) for o in outs]


def _merge_level_vmapped(planes, run: int, interpret: bool, n_keys: int = 2):
    """One merge-tree level over flat planes holding 2m ascending runs
    of length ``run``: vmap the pair merge over the m pairs."""
    n = planes[0].shape[0]
    m = n // (2 * run)

    def pair(ps):
        a = [p[0] for p in ps]
        b = [p[1] for p in ps]
        return _merge_level_one(a, b, interpret, n_keys)

    stacked = [p.reshape(m, 2, run) for p in planes]
    outs = jax.vmap(pair)(stacked)
    return [o.reshape(-1) for o in outs]


def sort_mixed_tiled(planes, n_keys: int = 2):
    """Full ascending sort of flat plane tuples at their native dtypes
    (keys = first n_keys planes, lexicographic).  Requires a power-of-
    two length that is a multiple of 2^14.  Bitonic => NOT stable; use
    only on payload-free streams."""
    n = planes[0].shape[0]
    assert n % _BLK == 0 and (n & (n - 1)) == 0, n
    interpret = jax.default_backend() != "tpu"
    planes = _block_sort_call(planes, interpret, n_keys)
    run = _BLK
    while run < n:
        planes = _merge_level_vmapped(planes, run, interpret, n_keys)
        run *= 2
    return planes


def sort_u48_tiled(t: jnp.ndarray, b16: jnp.ndarray):
    """Ascending sort of narrowed (t u32, b u16) pairs, 6 B/element
    through every Pallas stage.  Falls back to jax.lax.sort((t, b16))
    (bit-identical output order -- keys carry no payload) off-TPU, when
    the flag is off, or on ineligible shapes."""
    n = t.shape[0]
    eligible = (
        tiled_sort_enabled()
        and use_pallas_sort()
        and n >= 2 * _BLK
        and n % _BLK == 0
        and (n & (n - 1)) == 0
    )
    if not eligible:
        return jax.lax.sort((t, b16), num_keys=2)
    st, sb = sort_mixed_tiled([t, b16], n_keys=2)
    return st, sb
