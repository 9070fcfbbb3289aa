"""Multi-chip sharded counting on the simulated 8-device CPU mesh.

Determinism tests replace race detection (SURVEY.md section 5): the same
input must produce identical counts on 1, 2, 4, and 8 shards.
"""

import jax
import numpy as np
import pytest

from orion_kmer_tpu import codec
from orion_kmer_tpu.parallel import make_mesh, sharded_count


def _data(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    seq = rng.choice(list(b"ACGTN"), size=n).astype(np.uint8).tobytes()
    codes = codec.seq_to_codes(seq)
    return codes, codes == codec.INVALID_CODE


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
@pytest.mark.parametrize("k", [5, 21, 31])
def test_sharded_count_matches_oracle(n_dev, k):
    codes, invalid = _data()
    ref_vals = codec.extract_kmers_np(codes, k)
    exp_vals, exp_counts = np.unique(ref_vals, return_counts=True)
    mesh = make_mesh(n_devices=n_dev)
    vals, counts = sharded_count(codes, invalid, k, mesh=mesh)
    np.testing.assert_array_equal(vals, exp_vals)
    np.testing.assert_array_equal(counts, exp_counts)


def test_sharded_count_shard_invariance():
    codes, invalid = _data(seed=7)
    k = 17
    results = []
    for n_dev in (1, 8):
        vals, counts = sharded_count(codes, invalid, k, mesh=make_mesh(n_devices=n_dev))
        results.append((vals, counts))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8
