"""Pallas TPU kernel: fused lane-parallel canonical k-mer extraction.

Runs the exact per-lane math of ops/kmers_lanes.py inside VMEM tiles:
each grid step loads a block of packed lanes (+ the two lane-shifted
views and their invalid masks), assembles all 16 window offsets, reverses
/complements/canonicalizes in-register, and writes the (offset-major)
canonical pairs + validity without materializing any intermediate in HBM.

The XLA path (extract_canonical_lanes) produces identical results; this
kernel exists to keep the whole extraction at one HBM read + one write
per operand.  Selected via ORION_KMER_PALLAS (auto on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmers_lanes import extract_canonical_lane_math, lane_masks_from_invalid_words

_LANES_PER_BLOCK_MAX = 2048  # u32 lanes per grid step (rows of 128)


def _kernel(a_ref, b_ref, c_ref, ma_ref, mb_ref, mc_ref, hi_ref, lo_ref, v_ref, *, k):
    A = a_ref[:]
    B = b_ref[:]
    C = c_ref[:]
    MA = ma_ref[:]
    MB = mb_ref[:]
    MC = mc_ref[:]
    hi, lo, valid = extract_canonical_lane_math(
        A, B, C, MA, MB, MC, k, n_lanes_valid=None
    )
    # (16, rows, 128): offset-major stack; no in-kernel reshapes (Mosaic
    # rejects sublane->lane shape casts), the caller flattens outside.
    hi_ref[:] = hi
    lo_ref[:] = lo
    v_ref[:] = valid.astype(jnp.uint32)


@partial(jax.jit, static_argnames=("k",))
def extract_canonical_lanes_pallas(lanes, invalid_words, k: int, n_positions):
    """Pallas version of extract_canonical_lanes; same contract."""
    W = lanes.shape[0]
    block = min(_LANES_PER_BLOCK_MAX, W)
    assert W % block == 0 and block % 128 == 0, (W, block)
    rows = block // 128
    grid = W // block

    A = lanes.reshape(-1, 128)
    B = jnp.roll(lanes, -1).reshape(-1, 128)
    C = jnp.roll(lanes, -2).reshape(-1, 128)
    M = lane_masks_from_invalid_words(invalid_words)
    MA = M.reshape(-1, 128)
    MB = jnp.roll(M, -1).reshape(-1, 128)
    MC = jnp.roll(M, -2).reshape(-1, 128)

    in_spec = pl.BlockSpec(
        (rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (16, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    total_rows = W // 128
    interpret = jax.default_backend() != "tpu"
    hi, lo, v = pl.pallas_call(
        partial(_kernel, k=k),
        grid=(grid,),
        in_specs=[in_spec] * 6,
        out_specs=[out_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((16, total_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((16, total_rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((16, total_rows, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(A, B, C, MA, MB, MC)
    hi = hi.reshape(16, W)
    lo = lo.reshape(16, W)
    v = v.reshape(16, W)

    off = jax.lax.broadcasted_iota(jnp.int32, (16, W), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, W), 1)
    pos = lane * 16 + off
    valid = (v == 1) & (pos <= n_positions - k)
    return hi, lo, valid
