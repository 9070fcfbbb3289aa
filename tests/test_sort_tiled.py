"""Tiled mixed-dtype full sort (ops/sort_tiled.py, VERDICT r3 item 5).

Correctness is checked against the numpy oracle of the widened 48-bit
values under interpret mode (the Pallas network runs via the
interpreter on this CPU mesh) and against the lax.sort fallback's exact
plane ordering -- the streams carry no payload, so the unstable bitonic
network must produce byte-identical planes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_kmer_tpu.ops import sort_tiled
from orion_kmer_tpu.ops.count import narrow_u48, widen_u48_np


def _rand_u48(rng, n, k=21):
    """Random (t u32, b u16) narrowed pairs plus some SENTINEL slots."""
    vals = rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    lo = vals.astype(np.uint32)
    t, b = narrow_u48(jnp.asarray(hi), jnp.asarray(lo), k)
    t = np.array(t)  # copy: np.asarray of a jax array is read-only
    b16 = np.array(b).astype(np.uint16)
    mask = rng.random(n) < 0.01
    t[mask] = 0xFFFFFFFF
    b16[mask] = 0xFFFF
    return t, b16


def test_fallback_when_flag_off(monkeypatch):
    monkeypatch.delenv("ORION_KMER_TILED_SORT", raising=False)
    rng = np.random.default_rng(3)
    t, b16 = _rand_u48(rng, 1 << 15)
    st, sb = sort_tiled.sort_u48_tiled(jnp.asarray(t), jnp.asarray(b16))
    et, eb = jax.lax.sort((jnp.asarray(t), jnp.asarray(b16)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(et))
    np.testing.assert_array_equal(np.asarray(sb), np.asarray(eb))


def test_fallback_on_ineligible_shape(monkeypatch):
    # non-power-of-two: must silently take the lax.sort path
    monkeypatch.setenv("ORION_KMER_TILED_SORT", "1")
    rng = np.random.default_rng(4)
    t, b16 = _rand_u48(rng, 3 << 13)
    st, sb = sort_tiled.sort_u48_tiled(jnp.asarray(t), jnp.asarray(b16))
    et, eb = jax.lax.sort((jnp.asarray(t), jnp.asarray(b16)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(et))
    np.testing.assert_array_equal(np.asarray(sb), np.asarray(eb))


@pytest.mark.parametrize("n", [1 << 15, 1 << 16])
def test_tiled_matches_oracle(monkeypatch, n):
    monkeypatch.setenv("ORION_KMER_TILED_SORT", "1")
    rng = np.random.default_rng(n)
    t, b16 = _rand_u48(rng, n)
    st, sb = sort_tiled.sort_u48_tiled(jnp.asarray(t), jnp.asarray(b16))
    st, sb = np.asarray(st), np.asarray(sb)
    # plane-exact vs the lax fallback (no payload => unstable sort must
    # still reproduce the exact byte sequence)
    et, eb = jax.lax.sort((jnp.asarray(t), jnp.asarray(b16)), num_keys=2)
    np.testing.assert_array_equal(st, np.asarray(et))
    np.testing.assert_array_equal(sb, np.asarray(eb))
    # and vs the widened numpy oracle (sanity on the (t, b) order)
    got = widen_u48_np(st, sb.astype(np.uint32), 21)
    exp = np.sort(widen_u48_np(t, b16.astype(np.uint32), 21))
    np.testing.assert_array_equal(got, exp)


def test_tiled_with_duplicates_and_skew(monkeypatch):
    # heavy duplication (repeated k-mers) + a hot value: RLE downstream
    # depends only on grouping, but the planes must still be exact
    monkeypatch.setenv("ORION_KMER_TILED_SORT", "1")
    rng = np.random.default_rng(7)
    n = 1 << 15
    pool_t, pool_b = _rand_u48(rng, 64)
    idx = rng.integers(0, 64, size=n)
    idx[rng.random(n) < 0.3] = 0  # hot key
    t = pool_t[idx].copy()
    b16 = pool_b[idx].copy()
    st, sb = sort_tiled.sort_u48_tiled(jnp.asarray(t), jnp.asarray(b16))
    et, eb = jax.lax.sort((jnp.asarray(t), jnp.asarray(b16)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(et))
    np.testing.assert_array_equal(np.asarray(sb), np.asarray(eb))


def test_batch_path_uses_tiled(monkeypatch):
    # end-to-end: sort_canonical_packed_u48_n16 under the flag stays
    # oracle-exact at a 2-block-eligible batch size
    monkeypatch.setenv("ORION_KMER_TILED_SORT", "1")
    monkeypatch.setenv("ORION_KMER_U16_FOREST", "1")
    from orion_kmer_tpu import codec
    from orion_kmer_tpu.engine import pack_for_transfer
    from orion_kmer_tpu.ops.merge_mixed import sort_canonical_packed_u48_n16

    k = 21
    rng = np.random.default_rng(9)
    n = 1 << 15
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    codes[rng.random(n) < 0.01] = 255
    lanes, inv = pack_for_transfer(codes, n)
    st, sb, nv = sort_canonical_packed_u48_n16(
        jnp.asarray(lanes), jnp.asarray(inv), k
    )
    nv = int(nv)
    got = widen_u48_np(
        np.asarray(st)[:nv], np.asarray(sb)[:nv].astype(np.uint32), k
    )
    exp = np.sort(codec.extract_kmers_np(codes, k))
    np.testing.assert_array_equal(got, exp)
