"""Port of the reference codec unit-test table (kmer.rs:108-341)."""

import numpy as np
import pytest

from orion_kmer_tpu import codec
from orion_kmer_tpu.errors import InvalidKmerSize


def s2u(s, k):
    return codec.seq_to_u64(s, k)


class TestSeqToU64:
    def test_single_bases(self):
        assert s2u(b"A", 1) == 0b00
        assert s2u(b"C", 1) == 0b01
        assert s2u(b"G", 1) == 0b10
        assert s2u(b"T", 1) == 0b11

    def test_multi_base(self):
        assert s2u(b"ACG", 3) == 0b000110
        assert s2u(b"ACGT", 4) == 0b00011011
        assert s2u(b"TTTTT", 5) == 0b1111111111

    def test_k32_boundaries(self):
        assert s2u(b"A" * 32, 32) == 0
        assert s2u(b"T" * 32, 32) == 2**64 - 1

    def test_case_insensitive(self):
        assert s2u(b"acg", 3) == 0b000110

    def test_invalid_char(self):
        assert s2u(b"ACN", 3) is None
        assert s2u(b"NA", 2) is None
        assert s2u(b"X", 1) is None

    def test_invalid_k(self):
        assert s2u(b"A", 0) is None
        assert s2u(b"A", 33) is None
        assert s2u(b"ACG", 2) is None
        assert s2u(b"A", 2) is None


class TestU64ToSeq:
    def test_decode(self):
        assert codec.u64_to_seq(0b000110, 3) == b"ACG"
        assert codec.u64_to_seq(0b00011011, 4) == b"ACGT"
        assert codec.u64_to_seq(0b1111111111, 5) == b"TTTTT"
        assert codec.u64_to_seq(0, 1) == b"A"
        assert codec.u64_to_seq(0, 32) == b"A" * 32
        assert codec.u64_to_seq(2**64 - 1, 32) == b"T" * 32

    def test_invalid_k_raises(self):
        with pytest.raises(InvalidKmerSize):
            codec.u64_to_seq(0, 0)
        with pytest.raises(InvalidKmerSize):
            codec.u64_to_seq(0, 33)

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(1)
        for k in (1, 7, 16, 17, 32):
            vals = rng.integers(0, 2**62, size=20, dtype=np.uint64)
            if k < 32:
                vals &= np.uint64((1 << (2 * k)) - 1)
            seqs = codec.u64s_to_seqs(vals, k)
            for v, s in zip(vals.tolist(), seqs):
                assert codec.u64_to_seq(v, k) == s


class TestReverseComplement:
    @pytest.mark.parametrize(
        "fwd,rc,k",
        [
            (b"A", b"T", 1),
            (b"T", b"A", 1),
            (b"C", b"G", 1),
            (b"G", b"C", 1),
            (b"ACG", b"CGT", 3),
            (b"ATGC", b"GCAT", 4),
            (b"ATTA", b"TAAT", 4),
            (b"GTAC", b"GTAC", 4),  # self-complement palindrome
            (b"AAAAA", b"TTTTT", 5),
        ],
    )
    def test_rc(self, fwd, rc, k):
        assert codec.reverse_complement_u64(s2u(fwd, k), k) == s2u(rc, k)

    def test_invalid_k_raises(self):
        with pytest.raises(InvalidKmerSize):
            codec.reverse_complement_u64(0, 0)
        with pytest.raises(InvalidKmerSize):
            codec.reverse_complement_u64(0, 33)


class TestCanonical:
    def test_basic(self):
        assert codec.canonical_u64(s2u(b"ACG", 3), 3) == s2u(b"ACG", 3)
        assert codec.canonical_u64(s2u(b"TGT", 3), 3) == s2u(b"ACA", 3)
        assert codec.canonical_u64(s2u(b"GTAC", 4), 4) == s2u(b"GTAC", 4)
        assert codec.canonical_u64(s2u(b"GATTC", 5), 5) == s2u(b"GAATC", 5)

    def test_problematic_classify_kmers(self):
        # regression table from kmer.rs:112-156
        k = 4
        assert codec.canonical_u64(s2u(b"TTTT", k), k) == s2u(b"AAAA", k)
        assert codec.canonical_u64(s2u(b"TGGG", k), k) == s2u(b"CCCA", k)
        assert codec.canonical_u64(s2u(b"GGGA", k), k) == s2u(b"GGGA", k)
        assert codec.canonical_u64(s2u(b"TGGG", k), k) != codec.canonical_u64(
            s2u(b"GGGA", k), k
        )


class TestNormalization:
    def test_u_maps_to_t_when_normalizing(self):
        codes = codec.seq_to_codes(b"ACGU", normalize=True)
        assert codes.tolist() == [0, 1, 2, 3]

    def test_u_invalid_raw(self):
        # query path uses raw bytes (query.rs:80-81) where U is not a base
        codes = codec.seq_to_codes(b"ACGU", normalize=False)
        assert codes[3] == codec.INVALID_CODE

    def test_non_acgt_invalid(self):
        codes = codec.seq_to_codes(b"AN-.xZ", normalize=True)
        assert codes[0] == 0
        assert (codes[1:] == codec.INVALID_CODE).all()
