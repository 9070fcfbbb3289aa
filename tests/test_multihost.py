"""2-process jax.distributed smoke test (VERDICT round 1 #8).

Proves maybe_initialize_distributed + a mesh spanning BOTH processes'
devices actually compose: two CPU processes (2 local devices each) form
a 4-device global mesh, run one hash-range-sharded count step, and both
check the replicated result against the host oracle.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from orion_kmer_tpu.parallel.distributed import (
        maybe_initialize_distributed,
        multihost_sharded_count,
    )

    assert maybe_initialize_distributed(), "distributed init did not trigger"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    k = 9
    rng = np.random.default_rng(77)  # same seed in both processes
    codes = rng.integers(0, 4, size=4096, dtype=np.uint8)
    codes[rng.random(4096) < 0.02] = 255
    invalid = codes > 3

    vals, counts = multihost_sharded_count(codes, invalid, k)

    from orion_kmer_tpu import codec
    exp_v, exp_c = np.unique(codec.extract_kmers_np(codes, k), return_counts=True)
    np.testing.assert_array_equal(vals, exp_v)
    np.testing.assert_array_equal(counts, exp_c)
    out = sys.argv[1]
    with open(out, "w") as f:
        f.write(f"ok {jax.process_index()} {vals.shape[0]}")
    """
)


def test_two_process_distributed_sharded_count(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        repo_root = str(Path(__file__).resolve().parent.parent)
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            ORION_KMER_COORDINATOR=f"127.0.0.1:{port}",
            ORION_KMER_NUM_PROCESSES="2",
            ORION_KMER_PROCESS_ID=str(pid),
            PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(tmp_path / f"out{pid}")],
                env=env,
                cwd=str(Path(__file__).resolve().parent.parent),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = [p.communicate(timeout=240) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{se.decode()[-3000:]}"
    r0 = (tmp_path / "out0").read_text()
    r1 = (tmp_path / "out1").read_text()
    assert r0.startswith("ok 0 ") and r1.startswith("ok 1 ")
    assert r0.split()[2] == r1.split()[2]  # same unique count on both
