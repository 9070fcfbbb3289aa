"""2-process jax.distributed smoke test (VERDICT round 1 #8).

Proves maybe_initialize_distributed + a mesh spanning BOTH processes'
devices actually compose: two CPU processes (2 local devices each) form
a 4-device global mesh, run one hash-range-sharded count step, and both
check the replicated result against the host oracle.  The spawn/verify
logic lives in parallel.distributed.run_two_process_smoke so the driver
dryrun (__graft_entry__.dryrun_multichip) exercises the identical path.
"""

from orion_kmer_tpu.parallel.distributed import run_two_process_smoke


def test_two_process_distributed_sharded_count(tmp_path):
    res = run_two_process_smoke(tmp_path)
    assert res["processes"] == 2 and res["devices"] == 4
    assert res["unique"] > 0
