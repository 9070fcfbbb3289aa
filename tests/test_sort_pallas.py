"""Bitonic sort/merge network vs numpy oracles (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orion_kmer_tpu.ops import sort_pallas as sp


def _rand_pairs(rng, n, hi_bits=30):
    hi = rng.integers(0, 1 << hi_bits, size=n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    return hi, lo


def _np_sorted(hi, lo):
    v = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    v.sort()
    return (v >> np.uint64(32)).astype(np.uint32), v.astype(np.uint32)


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
@pytest.mark.parametrize("seed", [0, 1])
def test_sort_pairs_matches_numpy(n, seed):
    rng = np.random.default_rng(seed)
    hi, lo = _rand_pairs(rng, n)
    # inject duplicates and extremes
    hi[: n // 8] = hi[n // 8 : n // 4]
    lo[: n // 16] = lo[n // 16 : n // 8]
    hi[0] = lo[0] = 0
    hi[1] = lo[1] = 0xFFFFFFFF
    shi, slo = sp.sort_pairs(jnp.asarray(hi), jnp.asarray(lo))
    ehi, elo = _np_sorted(hi, lo)
    np.testing.assert_array_equal(np.asarray(shi), ehi)
    np.testing.assert_array_equal(np.asarray(slo), elo)


@pytest.mark.parametrize("split", [(1 << 13, 1 << 13), (1 << 14, 1 << 14)])
def test_merge_sorted_pairs_matches_numpy(split):
    na, nb = split
    rng = np.random.default_rng(42)
    a_hi, a_lo = _rand_pairs(rng, na)
    b_hi, b_lo = _rand_pairs(rng, nb)
    av = np.sort((a_hi.astype(np.uint64) << np.uint64(32)) | a_lo)
    bv = np.sort((b_hi.astype(np.uint64) << np.uint64(32)) | b_lo)
    a_cnt = rng.integers(1, 100, size=na, dtype=np.int32)
    b_cnt = rng.integers(1, 100, size=nb, dtype=np.int32)
    shi, slo, scnt = sp.merge_sorted_pairs(
        jnp.asarray((av >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(av.astype(np.uint32)),
        jnp.asarray(a_cnt),
        jnp.asarray((bv >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(bv.astype(np.uint32)),
        jnp.asarray(b_cnt),
    )
    sv = np.asarray(shi).astype(np.uint64) << np.uint64(32) | np.asarray(slo)
    ev = np.sort(np.concatenate([av, bv]))
    np.testing.assert_array_equal(sv, ev)
    # counts travel with their keys: total and per-key sums preserved
    assert int(np.asarray(scnt).sum()) == int(a_cnt.sum()) + int(b_cnt.sum())
    # per-key check via grouped sums
    allv = np.concatenate([av, bv])
    allc = np.concatenate([a_cnt, b_cnt])
    order = np.argsort(allv, kind="stable")
    np.testing.assert_array_equal(allv[order], sv)
    # counts may be permuted within equal keys; compare grouped sums
    uniq, inv = np.unique(allv, return_inverse=True)
    esum = np.zeros(len(uniq), np.int64)
    np.add.at(esum, inv, allc)
    gsum = np.zeros(len(uniq), np.int64)
    np.add.at(gsum, np.searchsorted(uniq, sv), np.asarray(scnt))
    np.testing.assert_array_equal(gsum, esum)


def test_merge_unequal_split_power_of_two_total():
    rng = np.random.default_rng(7)
    na, nb = (3 << 12), (1 << 12)  # 12288 + 4096 = 16384
    av = np.sort(rng.integers(0, 1 << 63, size=na, dtype=np.uint64))
    bv = np.sort(rng.integers(0, 1 << 63, size=nb, dtype=np.uint64))
    shi, slo, scnt = sp.merge_sorted_pairs(
        jnp.asarray((av >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(av.astype(np.uint32)),
        jnp.ones(na, jnp.int32),
        jnp.asarray((bv >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(bv.astype(np.uint32)),
        jnp.ones(nb, jnp.int32),
    )
    sv = np.asarray(shi).astype(np.uint64) << np.uint64(32) | np.asarray(slo)
    np.testing.assert_array_equal(sv, np.sort(np.concatenate([av, bv])))
    assert int(np.asarray(scnt).sum()) == na + nb


def test_small_sizes_fall_back_to_lax_sort():
    rng = np.random.default_rng(3)
    hi, lo = _rand_pairs(rng, 1000)  # non-power-of-two, small
    shi, slo = sp.sort_pairs(jnp.asarray(hi), jnp.asarray(lo))
    ehi, elo = _np_sorted(hi, lo)
    np.testing.assert_array_equal(np.asarray(shi), ehi)
    np.testing.assert_array_equal(np.asarray(slo), elo)


@pytest.mark.parametrize("total", [1 << 14, 1 << 19, 1 << 20])
def test_merge_large_sizes(total):
    """The tiled merge path (XLA CE prefix + Pallas tail) at/above the
    single-block size."""
    m = total // 2
    rng = np.random.default_rng(11)
    av = np.sort(rng.integers(0, 1 << 62, size=m, dtype=np.uint64))
    bv = np.sort(rng.integers(0, 1 << 62, size=m, dtype=np.uint64))
    shi, slo, scnt = sp.merge_sorted_pairs(
        jnp.asarray((av >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(av.astype(np.uint32)),
        jnp.ones(m, jnp.int32),
        jnp.asarray((bv >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(bv.astype(np.uint32)),
        jnp.ones(m, jnp.int32),
    )
    sv = np.asarray(shi).astype(np.uint64) << np.uint64(32) | np.asarray(slo)
    np.testing.assert_array_equal(sv, np.sort(np.concatenate([av, bv])))
    assert int(np.asarray(scnt).sum()) == total


def test_compact_left_pallas_matches_xla(monkeypatch):
    """The fused per-pass compaction kernel (interpret mode off-TPU) must
    match the XLA bit-pass compactor exactly."""
    import jax

    from orion_kmer_tpu.ops.count import _compact_left

    rng = np.random.default_rng(13)
    n = 1 << 17  # 4 blocks of 2^15
    planes = [
        jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32))
        for _ in range(3)
    ]
    for density in (0.03, 0.5, 0.97):
        keep = jnp.asarray(rng.random(n) < density)
        ref = _compact_left(planes, keep)
        got = sp.compact_left_pallas(planes, keep)
        nk = int(np.asarray(keep).sum())
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r)[:nk], np.asarray(g)[:nk])


class TestSub32PlaneWidening:
    """sort_pallas._gt/_ce_lanes widen sub-32-bit planes to u32
    in-register: Mosaic v5e rejects 16-bit vector compares (both
    signednesses) and u16 pltpu.roll (tools/probe_u16_mosaic.py, round
    4).  The guards are generic hardening for any future narrow-plane
    kernel; these tests keep them covered after the u16-forest fork was
    retired (interpret mode checks semantics; the lowering itself was
    chip-validated byte-exact before the fork's deletion)."""

    def test_gt_u16_plane_matches_widened(self):
        rng = np.random.default_rng(7)
        a_t = jnp.asarray(rng.integers(0, 1 << 8, 256, np.uint32))
        b_t = jnp.asarray(rng.integers(0, 1 << 8, 256, np.uint32))
        a_b = rng.integers(0, 1 << 16, 256, np.uint32)
        b_b = rng.integers(0, 1 << 16, 256, np.uint32)
        got = sp._gt(
            [a_t, jnp.asarray(a_b.astype(np.uint16))],
            [b_t, jnp.asarray(b_b.astype(np.uint16))],
            2,
        )
        want = sp._gt(
            [a_t, jnp.asarray(a_b)], [b_t, jnp.asarray(b_b)], 2
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the compare itself must run at >= 32 bits: unsigned u16
        # ordering across the 0x8000 boundary is the failure mode a
        # signed-i16 compare would get wrong
        hi16 = jnp.asarray(np.full(128, 0x8001, np.uint16)).reshape(1, 128)
        lo16 = jnp.asarray(np.full(128, 0x0001, np.uint16)).reshape(1, 128)
        one = jnp.zeros((1, 128), jnp.uint32)
        assert bool(np.asarray(sp._gt([one, hi16], [one, lo16], 2)).all())

    def test_ce_lanes_u16_payload_roundtrip(self):
        # one ascending CE pass at lane stride 1 over a (u32 key, u16
        # payload) pair: the u16 plane must move with its key and come
        # back as u16
        rng = np.random.default_rng(11)
        key = rng.integers(0, 1 << 30, 128, np.uint32)
        pay = (key & 0xFFFF).astype(np.uint16)

        def no_desc(l_iota):
            return jnp.zeros((), jnp.bool_)

        planes = [
            jnp.asarray(key).reshape(1, 128),
            jnp.asarray(pay).reshape(1, 128),
        ]
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import jax

        def kernel(k_ref, p_ref, ok_ref, op_ref):
            outs = sp._ce_lanes([k_ref[:], p_ref[:]], 1, no_desc, n_keys=1)
            ok_ref[:] = outs[0]
            op_ref[:] = outs[1]

        spec = pl.BlockSpec((1, 128), lambda: (0, 0), memory_space=pltpu.VMEM)
        ok, op = pl.pallas_call(
            kernel,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((1, 128), jnp.uint32),
                jax.ShapeDtypeStruct((1, 128), jnp.uint16),
            ],
            interpret=True,
        )(*planes)
        ok = np.asarray(ok).reshape(-1)
        op = np.asarray(op).reshape(-1)
        assert op.dtype == np.uint16
        # payload still pairs with its key after the exchanges
        np.testing.assert_array_equal(op, (ok & 0xFFFF).astype(np.uint16))
        # and each adjacent even/odd lane pair is ascending
        assert bool((ok[0::2] <= ok[1::2]).all())
