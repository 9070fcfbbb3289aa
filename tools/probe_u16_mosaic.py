"""Mosaic u16 capability probe (round 4).

vfy_u16.sh found the u16 merge forest fails to compile on the real
chip: `arith.cmpi` predicate 8 (unsigned >) on vector<...xi16> =>
"Target does not support this comparison".  Before choosing a fix
(in-register widen inside _gt vs widen-at-kernel-entry copies of the
builders), compile one tiny Pallas kernel per u16 op the sort/merge
kernels rely on and report which lower:

  cmp_u16        a > b on native u16            (the known failure)
  cmp_i16        biased signed compare           (alt fix: bias repr)
  cmp_widen      a.astype(u32) > b.astype(u32)   (fix A: _gt widens)
  sel_u16        jnp.where(mask, a, b) swap on u16 planes
  roll_u16       pltpu.roll(a, 3, 1) lane roll on u16
  reshape_u16    sublane CE reshape (R,128)->(G,2,s,128) + where
  transpose_u16  (128,128) u16 transpose (sort_tiled block kernel)

Run ON the TPU, one client at a time:
    timeout 900 python tools/probe_u16_mosaic.py
Each case is its own tiny program (~40 s first compile through the
remote service; cached afterwards).
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U16 = jnp.uint16
U32 = jnp.uint32
R, L = 16, 128


def _call(kernel, n_in, n_out, dtype=U16, shape=(R, L)):
    spec = pl.BlockSpec(shape, lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * n_in,
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=(
            [jax.ShapeDtypeStruct(shape, dtype)] * n_out
            if n_out > 1
            else jax.ShapeDtypeStruct(shape, dtype)
        ),
    )


def k_cmp_u16(a_ref, b_ref, o_ref):
    gt = a_ref[:] > b_ref[:]
    o_ref[:] = jnp.where(gt, a_ref[:], b_ref[:])


def k_cmp_i16(a_ref, b_ref, o_ref):
    # biased-signed ordering == unsigned ordering of (x ^ 0x8000)
    a = (a_ref[:] ^ jnp.uint16(0x8000)).astype(jnp.int16)
    b = (b_ref[:] ^ jnp.uint16(0x8000)).astype(jnp.int16)
    gt = a > b
    o_ref[:] = jnp.where(gt, a_ref[:], b_ref[:])


def k_cmp_widen(a_ref, b_ref, o_ref):
    gt = a_ref[:].astype(U32) > b_ref[:].astype(U32)
    o_ref[:] = jnp.where(gt, a_ref[:], b_ref[:])


def k_sel_u16(a_ref, b_ref, o_ref):
    m = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1) & 1
    o_ref[:] = jnp.where(m == 0, a_ref[:], b_ref[:])


def k_roll_u16(a_ref, o_ref):
    o_ref[:] = pltpu.roll(a_ref[:], 3, 1)


def k_reshape_u16(a_ref, b_ref, o_ref):
    # sublane CE at row stride 4 with a widened compare (the _ce_rows shape)
    s = 4
    g = R // (2 * s)
    va = a_ref[:].reshape(g, 2, s, L)
    vb = b_ref[:].reshape(g, 2, s, L)
    gt = va[:, 0].astype(U32) > vb[:, 1].astype(U32)
    lo = jnp.where(gt, vb[:, 1], va[:, 0])
    hi = jnp.where(gt, va[:, 0], vb[:, 1])
    o_ref[:] = jnp.stack([lo, hi], axis=1).reshape(R, L)


def k_transpose_u16(a_ref, o_ref):
    o_ref[:] = a_ref[:].T


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (R, L), np.uint32).astype(np.uint16))
    b = jnp.asarray(rng.integers(0, 1 << 16, (R, L), np.uint32).astype(np.uint16))
    sq = jnp.asarray(
        rng.integers(0, 1 << 16, (L, L), np.uint32).astype(np.uint16)
    )
    an, bn = np.asarray(a), np.asarray(b)

    cases = [
        ("cmp_u16", _call(k_cmp_u16, 2, 1), (a, b), np.where(an > bn, an, bn)),
        ("cmp_i16", _call(k_cmp_i16, 2, 1), (a, b), np.where(an > bn, an, bn)),
        ("cmp_widen", _call(k_cmp_widen, 2, 1), (a, b), np.where(an > bn, an, bn)),
        ("sel_u16", _call(k_sel_u16, 2, 1), (a, b), None),
        ("roll_u16", _call(k_roll_u16, 1, 1), (a,), np.roll(an, 3, 1)),
        ("reshape_u16", _call(k_reshape_u16, 2, 1), (a, b), None),
        (
            "transpose_u16",
            _call(k_transpose_u16, 1, 1, shape=(L, L)),
            (sq,),
            np.asarray(sq).T,
        ),
    ]
    results = {}
    for name, fn, args, want in cases:
        try:
            got = np.asarray(jax.jit(fn)(*args))
            ok = True if want is None else bool(np.array_equal(got, want))
            results[name] = "OK" if ok else "COMPILES-BUT-WRONG"
        except Exception as e:  # noqa: BLE001 - we want the lowering error
            msg = str(e).split("\n")[0][:120]
            results[name] = f"FAIL: {msg}"
            if os.environ.get("ORION_KMER_DEBUG"):
                traceback.print_exc()
        print(f"{name:14s} {results[name]}", flush=True)
    print("PROBE-DONE", {k: v[:40] for k, v in results.items()})


if __name__ == "__main__":
    main()
