"""Mixed-dtype (t u32, b u16) merge-forest path vs oracles.

ORION_KMER_U16_FOREST gates the path in the engine (off by default
until on-chip Mosaic validation -- ops/merge_mixed.py docstring); these
tests exercise it explicitly: the Pallas kernels run under interpret
mode on the CPU mesh, the XLA fallback via non-power-of-two sizes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from orion_kmer_tpu import codec
from orion_kmer_tpu.ops import count as ops_count
from orion_kmer_tpu.ops import merge_mixed as mm

K = 21
B_BITS = 2 * K - 32  # 10


def _rand_sorted_u48(rng, n):
    v = np.sort(rng.integers(0, 1 << (2 * K), size=n, dtype=np.uint64))
    t = (v >> np.uint64(B_BITS)).astype(np.uint32)
    b = (v & np.uint64((1 << B_BITS) - 1)).astype(np.uint16)
    return v, t, b


def _widen_np(t, b):
    return (np.asarray(t, np.uint64) << np.uint64(B_BITS)) | np.asarray(b, np.uint64)


class TestMergeU48:
    @pytest.mark.parametrize(
        "split",
        [
            (1 << 13, 1 << 13),  # power-of-two total: Pallas interpret path
            (1 << 14, 1 << 14),
            (1 << 12, 3 << 12),  # unequal pow2 total: materialized bitonic
            (1000, 2000),  # non-pow2: XLA lax.sort fallback
        ],
    )
    def test_matches_numpy(self, split):
        na, nb = split
        rng = np.random.default_rng(na ^ nb)
        av, at, ab = _rand_sorted_u48(rng, na)
        bv, bt, bb = _rand_sorted_u48(rng, nb)
        mt, mb = mm.merge_sorted_streams_u48(
            jnp.asarray(at), jnp.asarray(ab), jnp.asarray(bt), jnp.asarray(bb)
        )
        assert mt.dtype == jnp.uint32 and mb.dtype == jnp.uint16
        got = _widen_np(np.asarray(mt), np.asarray(mb))
        np.testing.assert_array_equal(got, np.sort(np.concatenate([av, bv])))

    def test_duplicates_and_sentinel_tails(self):
        """Valid prefixes + (SENTINEL, 0xFFFF) tails, heavy duplicates --
        the exact shape of forest runs mid-stream."""
        n = 1 << 13
        rng = np.random.default_rng(7)
        # small value universe forces long equal runs
        av = np.sort(rng.integers(0, 512, size=n, dtype=np.uint64))
        bv = np.sort(rng.integers(0, 512, size=n, dtype=np.uint64))
        na_valid, nb_valid = n - 100, n - 57
        at = (av >> np.uint64(B_BITS)).astype(np.uint32)
        ab = (av & np.uint64((1 << B_BITS) - 1)).astype(np.uint16)
        bt = (bv >> np.uint64(B_BITS)).astype(np.uint32)
        bb = (bv & np.uint64((1 << B_BITS) - 1)).astype(np.uint16)
        at[na_valid:] = 0xFFFFFFFF
        ab[na_valid:] = 0xFFFF
        bt[nb_valid:] = 0xFFFFFFFF
        bb[nb_valid:] = 0xFFFF
        mt, mb = mm.merge_sorted_streams_u48(
            jnp.asarray(at), jnp.asarray(ab), jnp.asarray(bt), jnp.asarray(bb)
        )
        mt, mb = np.asarray(mt), np.asarray(mb)
        n_valid = na_valid + nb_valid
        got = _widen_np(mt[:n_valid], mb[:n_valid])
        exp = np.sort(np.concatenate([av[:na_valid], bv[:nb_valid]]))
        np.testing.assert_array_equal(got, exp)
        # sentinels stay a contiguous tail
        assert (mt[n_valid:] == 0xFFFFFFFF).all()
        assert (mb[n_valid:] == 0xFFFF).all()


class TestSortN16:
    @pytest.mark.parametrize("k", [17, 21, 24])
    def test_matches_widened_path_and_oracle(self, k, monkeypatch):
        from orion_kmer_tpu.engine import pack_for_transfer

        monkeypatch.setattr(ops_count, "CHUNK_POSITIONS", 1 << 12)
        rng = np.random.default_rng(80 + k)
        n = 1 << 14  # 4 chunks through the mixed merge tree
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        codes[rng.random(n) < 0.01] = 255
        lanes, inv = pack_for_transfer(codes, n)
        st, sb, nv = mm.sort_canonical_packed_u48_n16(
            jnp.asarray(lanes), jnp.asarray(inv), k
        )
        assert sb.dtype == jnp.uint16
        ut, ub, ucnt, nu = mm.rle_compact_u48(st, sb, nv)
        # widened reference path
        gt, gb, gnv = ops_count.sort_canonical_packed_u48(
            jnp.asarray(lanes), jnp.asarray(inv), k
        )
        eut, eub, eucnt, enu = ops_count.rle_compact(gt, gb, gnv)
        nu, enu = int(nu), int(enu)
        assert nu == enu and int(nv) == int(gnv)
        got = ops_count.widen_u48_np(np.asarray(ut)[:nu], np.asarray(ub)[:nu], k)
        exp = ops_count.widen_u48_np(np.asarray(eut)[:enu], np.asarray(eub)[:enu], k)
        np.testing.assert_array_equal(got, exp)
        np.testing.assert_array_equal(
            np.asarray(ucnt)[:nu], np.asarray(eucnt)[:enu]
        )
        # and the host oracle
        ref_v, ref_c = np.unique(codec.extract_kmers_np(codes, k), return_counts=True)
        np.testing.assert_array_equal(got, ref_v)
        np.testing.assert_array_equal(np.asarray(ucnt)[:nu], ref_c)

    def test_poly_a_ties(self):
        """Equal-t, differing-b keys: the u16 plane is the only
        tiebreaker (mirrors TestU48Path.test_low_complexity_narrow_ties)."""
        k = 21
        from orion_kmer_tpu.engine import pack_for_transfer

        rng = np.random.default_rng(99)
        codes = np.zeros(2048, dtype=np.uint8)
        snp = rng.choice(2048, size=40, replace=False)
        codes[snp] = rng.integers(1, 4, size=40)
        codes[rng.choice(2048, size=8, replace=False)] = 255
        lanes, inv = pack_for_transfer(codes, 2048)
        st, sb, nv = mm.sort_canonical_packed_u48_n16(
            jnp.asarray(lanes), jnp.asarray(inv), k
        )
        ut, ub, ucnt, nu = mm.rle_compact_u48(st, sb, nv)
        nu = int(nu)
        got = ops_count.widen_u48_np(np.asarray(ut)[:nu], np.asarray(ub)[:nu], k)
        ref_v, ref_c = np.unique(codec.extract_kmers_np(codes, k), return_counts=True)
        np.testing.assert_array_equal(got, ref_v)
        np.testing.assert_array_equal(np.asarray(ucnt)[:nu], ref_c)


class TestEngineU16Forest:
    def test_device_count_table_flag_parity(self, monkeypatch):
        """DeviceCountTable with ORION_KMER_U16_FOREST=1 must produce the
        exact result of the default path (multi-batch: forest merges,
        mid-stream flush, spill) on the same input."""
        from orion_kmer_tpu.engine import DeviceCountTable

        k = 21
        rng = np.random.default_rng(3)
        seq = rng.choice(list(b"ACGTN"), size=60000).astype(np.uint8).tobytes()
        codes = codec.seq_to_codes(seq)

        def run(flag):
            monkeypatch.setenv("ORION_KMER_U16_FOREST", flag)
            table = DeviceCountTable(k)
            a = 0
            while a < len(codes):
                b = min(a + 17001, len(codes))
                table.update(codes[a:b])
                if b >= len(codes):
                    break
                a = b - (k - 1)
            assert table._n16 == (flag == "1")
            return table.result()

        v16, c16 = run("1")
        v32, c32 = run("0")
        np.testing.assert_array_equal(v16, v32)
        np.testing.assert_array_equal(c16, c32)
        # and the oracle
        exp_v, exp_c = np.unique(codec.extract_kmers_np(codes, k), return_counts=True)
        np.testing.assert_array_equal(v16, exp_v)
        np.testing.assert_array_equal(c16, exp_c)

    def test_count_file_flag_parity(self, tmp_path, monkeypatch):
        """The full CLI ingest path (native parse -> prefetch -> forest
        -> spill) under the flag matches the default path byte-for-byte."""
        from orion_kmer_tpu.engine import count_file

        rng = np.random.default_rng(11)
        seq = bytes(rng.choice(list(b"ACGTN"), size=40000, p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.uint8))
        fa = tmp_path / "in.fasta"
        fa.write_bytes(b">r0\n" + seq + b"\n")
        monkeypatch.setenv("ORION_KMER_U16_FOREST", "1")
        v16, c16 = count_file(fa, 21)
        monkeypatch.setenv("ORION_KMER_U16_FOREST", "0")
        v32, c32 = count_file(fa, 21)
        np.testing.assert_array_equal(v16, v32)
        np.testing.assert_array_equal(c16, c32)

    def test_sharded_table_flag_parity(self, monkeypatch):
        """ShardedCountTable under ORION_KMER_U16_FOREST=1: the per-shard
        forests carry (t, b u16) runs; results must match the default
        sharded path and the host oracle (mid-stream flush included)."""
        from orion_kmer_tpu.parallel import make_mesh
        from orion_kmer_tpu.parallel.streaming import ShardedCountTable

        k = 21
        rng = np.random.default_rng(17)
        codes = rng.integers(0, 4, size=9000, dtype=np.uint8)
        codes[rng.random(9000) < 0.02] = 255
        codes[2000:2300] = 0  # poly-A: equal-t ties through u16 merges

        def run(flag):
            monkeypatch.setenv("ORION_KMER_U16_FOREST", flag)
            t = ShardedCountTable(k, mesh=make_mesh(n_devices=8))
            assert t._n16 == (flag == "1")
            t.update(codes)
            t.flush()
            t.update(codes)
            return t.result()

        v16, c16 = run("1")
        v32, c32 = run("0")
        np.testing.assert_array_equal(v16, v32)
        np.testing.assert_array_equal(c16, c32)
        sep = np.full(k - 1, 255, dtype=np.uint8)
        ref = codec.extract_kmers_np(np.concatenate([codes, sep, codes]), k)
        ev, ec = np.unique(ref, return_counts=True)
        np.testing.assert_array_equal(v16, ev)
        np.testing.assert_array_equal(c16, ec)

    def test_warm_and_flush_midstream(self, monkeypatch):
        monkeypatch.setenv("ORION_KMER_U16_FOREST", "1")
        from orion_kmer_tpu.engine import DeviceCountTable

        k = 19
        table = DeviceCountTable(k)
        table.warm(size=1 << 10, max_depth=2)  # traces the n16 programs
        codes1 = codec.seq_to_codes(b"ACGTACGTACGTACGTACGTACGTACGT")
        codes2 = codec.seq_to_codes(b"TTTTTTTTTTTTTTTTTTTTTTTTTTTT")
        table.update(codes1)
        table.flush()
        table.update(codes2)
        vals, counts = table.result()
        exp_v, exp_c = np.unique(
            np.concatenate(
                [codec.extract_kmers_np(codes1, k), codec.extract_kmers_np(codes2, k)]
            ),
            return_counts=True,
        )
        np.testing.assert_array_equal(vals, exp_v)
        np.testing.assert_array_equal(counts, exp_c)
