"""FracMinHash sketching: device kernel vs host oracle + CLI round trip."""

import json

import jax.numpy as jnp
import numpy as np

from orion_kmer_tpu import codec
from orion_kmer_tpu.ops.hash import splitmix64_np
from orion_kmer_tpu.ops.kmers import join_u64
from orion_kmer_tpu.ops.sketch import sketch_batch, sketch_compare, sketch_np

from .util import run_cli, write_file


def _codes(seq):
    c = codec.seq_to_codes(seq)
    return c, c == codec.INVALID_CODE


def test_sketch_batch_matches_oracle():
    rng = np.random.default_rng(0)
    seq = rng.choice(list(b"ACGT"), size=20000).astype(np.uint8).tobytes()
    codes, invalid = _codes(seq)
    k, scaled = 21, 50
    uhi, ulo, cnt, nu, _ = sketch_batch(jnp.asarray(codes), jnp.asarray(invalid), k, scaled)
    nu = int(nu)
    got = join_u64(np.asarray(uhi)[:nu], np.asarray(ulo)[:nu])
    kmers = codec.extract_kmers_np(codes, k)
    exp = sketch_np(kmers, scaled)
    np.testing.assert_array_equal(got, exp)


def test_sketch_abundances_are_kmer_multiplicities():
    seq = b"ACGTACGTACGT" * 10
    codes, invalid = _codes(seq)
    k, scaled = 4, 1  # scaled=1 keeps everything
    uhi, ulo, cnt, nu, _ = sketch_batch(jnp.asarray(codes), jnp.asarray(invalid), k, scaled)
    nu = int(nu)
    kmers = codec.extract_kmers_np(codes, k)
    vals, counts = np.unique(kmers, return_counts=True)
    hashes = splitmix64_np(vals)
    order = np.argsort(hashes)
    got = join_u64(np.asarray(uhi)[:nu], np.asarray(ulo)[:nu])
    np.testing.assert_array_equal(got, hashes[order])
    np.testing.assert_array_equal(np.asarray(cnt)[:nu], counts[order])


def test_sketch_compare_identical():
    a = np.array([1, 5, 9], dtype=np.uint64)
    stats = sketch_compare(a, a)
    assert stats["jaccard"] == 1.0
    assert stats["containment_a_in_b"] == 1.0


def test_sketch_compare_disjoint():
    a = np.array([1, 2], dtype=np.uint64)
    b = np.array([3, 4], dtype=np.uint64)
    stats = sketch_compare(a, b)
    assert stats["jaccard"] == 0.0


def test_sketch_cli_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    g1 = "".join(rng.choice(list("ACGT"), size=3000))
    # g2 = g1 with a mutated tail: high but <1.0 jaccard
    g2 = g1[:2400] + "".join(rng.choice(list("ACGT"), size=600))
    f1 = write_file(tmp_path / "g1.fa", f">g1\n{g1}\n")
    f2 = write_file(tmp_path / "g2.fa", f">g2\n{g2}\n")
    sig = tmp_path / "both.sig"
    rc = run_cli("sketch", "-k", 21, "--scaled", 10, "-i", f1, f2, "-o", sig)
    assert rc == 0
    doc = json.loads(sig.read_text())
    assert doc["k"] == 21 and doc["scaled"] == 10
    assert len(doc["sketches"]) == 2

    out = tmp_path / "cmp.json"
    rc = run_cli("sketch-compare", "-s", sig, "-o", out)
    assert rc == 0
    res = json.loads(out.read_text())
    assert len(res["pairs"]) == 1
    j = res["pairs"][0]["jaccard"]
    assert 0.3 < j < 1.0  # shared 2400-base prefix, distinct tail

    # estimator sanity: sketch jaccard approximates true k-mer jaccard
    k1 = set(codec.extract_kmers_np(codec.seq_to_codes(g1.encode()), 21).tolist())
    k2 = set(codec.extract_kmers_np(codec.seq_to_codes(g2.encode()), 21).tolist())
    true_j = len(k1 & k2) / len(k1 | k2)
    assert abs(j - true_j) < 0.15


def test_sketch_param_mismatch(tmp_path, capsys):
    f1 = write_file(tmp_path / "g.fa", ">g\nACGTACGTACGTACGTACGTACGT\n")
    s1 = tmp_path / "a.sig"
    s2 = tmp_path / "b.sig"
    assert run_cli("sketch", "-k", 11, "--scaled", 1, "-i", f1, "-o", s1) == 0
    assert run_cli("sketch", "-k", 13, "--scaled", 1, "-i", f1, "-o", s2) == 0
    rc = run_cli("sketch-compare", "-s", s1, s2, "-o", tmp_path / "o.json")
    assert rc == 1
    assert "Sketch parameter mismatch" in capsys.readouterr().err


def test_sketch_packed_matches_sketch_batch():
    from orion_kmer_tpu.engine import pack_for_transfer
    from orion_kmer_tpu.ops.sketch import sketch_packed

    rng = np.random.default_rng(55)
    n = 1 << 14
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    codes[rng.random(n) < 0.01] = 255
    k, scaled = 21, 8
    ehi, elo, ecnt, enu, _ = sketch_batch(
        jnp.asarray(np.where(codes > 3, 0, codes)),
        jnp.asarray(codes > 3),
        k,
        scaled,
    )
    lanes, inv = pack_for_transfer(codes, n)
    ghi, glo, gcnt, gnu, _ = sketch_packed(jnp.asarray(lanes), jnp.asarray(inv), k, scaled)
    enu, gnu = int(enu), int(gnu)
    assert enu == gnu
    np.testing.assert_array_equal(np.asarray(ghi)[:gnu], np.asarray(ehi)[:enu])
    np.testing.assert_array_equal(np.asarray(glo)[:gnu], np.asarray(elo)[:enu])
    np.testing.assert_array_equal(np.asarray(gcnt)[:gnu], np.asarray(ecnt)[:enu])


def test_sketch_sparse_overflow_flag_and_dense_recovery():
    """Regression (ADVICE round 1): a low-complexity repeat whose
    multiplicity exceeds the 8x sparse headroom must raise the overflow
    flag, and the dense retry must be exact (the reference FracMinHash
    is exact for any input)."""
    from orion_kmer_tpu.ops.sketch import sketch_batch as sb

    n = 1 << 17
    scaled = 64
    # period-4 repeat chosen so one canonical k-mer hash survives the
    # threshold: its multiplicity (~n/4) then far exceeds cap = 8n/scaled
    codes = np.tile(np.array([0, 1, 0, 3], dtype=np.uint8), n // 4)
    invalid = codes > 3
    k = 4
    uhi, ulo, cnt, nu, ovf = sb(jnp.asarray(codes), jnp.asarray(invalid), k, scaled)
    assert int(ovf) == 1  # sparse path truncated and reported it
    dhi, dlo, dcnt, dnu, dovf = sb(
        jnp.asarray(codes), jnp.asarray(invalid), k, scaled, dense=True
    )
    assert int(dovf) == 0
    kmers = codec.extract_kmers_np(codes, k)
    exp = sketch_np(kmers, scaled)
    dnu = int(dnu)
    got = join_u64(np.asarray(dhi)[:dnu], np.asarray(dlo)[:dnu])
    np.testing.assert_array_equal(got, exp)
    # abundances exact on the dense path
    vals, counts = np.unique(kmers, return_counts=True)
    h = splitmix64_np(vals)
    thr = np.uint64((1 << 64) // scaled)
    keep = h < thr
    hk, ck = h[keep], counts[keep]
    order = np.argsort(hk)
    np.testing.assert_array_equal(np.asarray(dcnt)[:dnu], ck[order])


def test_sketch_num_cap_bounded_and_exact(tmp_path, monkeypatch):
    """--num sketches must consolidate incrementally (bounded memory) and
    still produce the exact bottom-num hashes with exact abundances."""
    import orion_kmer_tpu.engine as engine

    from .util import run_cli, write_file as wf

    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), size=6000))
    p = wf(tmp_path / "g.fa", f">g\n{seq}\n")
    # tiny batches so many accumulator adds + trims happen
    import orion_kmer_tpu.commands.sketch as sketch_cmd

    orig = sketch_cmd.sketch_file
    monkeypatch.setattr(
        sketch_cmd,
        "sketch_file",
        lambda path, k, scaled, num=0: orig(path, k, scaled, num, batch_positions=512),
    )
    s1 = tmp_path / "n.sig"
    assert run_cli("sketch", "-k", 15, "--scaled", 1, "--num", 20, "-i", p, "-o", s1) == 0
    doc = json.loads(s1.read_text())
    got = np.array([int(h) for h in doc["sketches"][0]["hashes"]], dtype=np.uint64)
    kmers = codec.extract_kmers_np(codec.seq_to_codes(seq.encode()), 15)
    vals, counts = np.unique(kmers, return_counts=True)
    h = splitmix64_np(vals)
    order = np.argsort(h)
    exp_h = h[order][:20]
    exp_c = counts[order][:20]
    np.testing.assert_array_equal(got, exp_h)
    np.testing.assert_array_equal(np.array(doc["sketches"][0]["abundances"]), exp_c)


def test_pairwise_intersections_matches_intersect1d():
    """The one-sort all-pairs path must return exactly the per-pair
    np.intersect1d sizes it replaces (VERDICT round 2 weak #5)."""
    from orion_kmer_tpu.ops.sketch import pairwise_intersections

    rng = np.random.default_rng(7)
    P = 12
    sketches = [
        np.unique(rng.integers(0, 500, size=rng.integers(0, 200), dtype=np.uint64))
        for _ in range(P)
    ]
    sketches[3] = np.empty(0, dtype=np.uint64)  # empty sketch edge
    sketches[5] = sketches[2].copy()  # identical pair edge
    mat = pairwise_intersections(sketches)
    assert mat.shape == (P, P)
    for i in range(P):
        assert mat[i, i] == sketches[i].shape[0]
        for j in range(P):
            exp = len(np.intersect1d(sketches[i], sketches[j]))
            if i != j:
                assert mat[i, j] == exp, (i, j)
    # symmetric
    np.testing.assert_array_equal(mat, mat.T)


def test_pairwise_intersections_scales():
    """A 1000-sketch synthetic cohort completes in seconds (the old
    O(P^2) intersect1d loop would do 500k host intersections)."""
    import time

    from orion_kmer_tpu.ops.sketch import pairwise_intersections

    rng = np.random.default_rng(11)
    base = np.unique(rng.integers(0, 1 << 60, size=400, dtype=np.uint64))
    sketches = []
    for _ in range(1000):
        mask = rng.random(base.shape[0]) < 0.5
        sketches.append(base[mask])
    t0 = time.perf_counter()
    mat = pairwise_intersections(sketches)
    dt = time.perf_counter() - t0
    assert dt < 30.0, dt
    # spot-check a few pairs against the oracle
    for i, j in [(0, 1), (17, 900), (499, 500)]:
        assert mat[i, j] == len(np.intersect1d(sketches[i], sketches[j]))
