"""Multi-host initialization.

The reference is strictly single-host (SURVEY.md 2.3); scaling past one
host here means a JAX distributed runtime: each host process calls
jax.distributed.initialize() and the (shard,) mesh spans every chip in
the slice, with the all_to_all hash routing riding ICI within a slice
and DCN across hosts.  This helper wires the standard environment
contract (coordinator address / process count / process id) and is a
no-op on a single host.

Real multi-host hardware is not available in the round-1 environment;
the code path is exercised by the simulated-mesh tests and
dryrun_multichip.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("orion_kmer_tpu.parallel.distributed")

_initialized = False


def multihost_sharded_count(codes, invalid, k: int, capacity_factor: float = 2.0,
                            stats: dict | None = None):
    """One sharded count step across EVERY process's devices.

    Multi-process composition of the hash-range sharded counter
    (parallel.sharded): all processes pass the same full (codes,
    invalid) host arrays; each contributes its addressable shards via
    jax.make_array_from_callback, the per-device step owner-routes
    extracted k-mers with the capacity-bounded all_to_all
    (sharded.route_to_owners -- the SAME route the production
    ShardedCountTable uses, riding ICI within a host and DCN across
    hosts), and only the small per-owner RLE RESULTS are
    all_gather-replicated so every process can read them without
    cross-host fetches.  Capacity overflow (psum-detected) retries with
    doubled capacity, preserving exactness.  Returns (vals uint64,
    counts int64), identical on every process.

    ``stats``, if given, is filled with the same shape-derived traffic
    accounting as ShardedCountTable.stats_report (a2a/ici bytes per
    position): the DCN-analog scaling evidence for BASELINE config 5.

    This is the DCN-spanning analog of sharded.sharded_count (the
    reference has no multi-host precedent; BASELINE config 5 names
    N>=2 hosts).
    """
    import math

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from ..ops.count import count_kmers
    from ..ops.kmers import extract_canonical, join_u64
    from .sharded import _shard_blocks, route_to_owners

    devices = np.array(jax.devices())
    n_shards = devices.size
    mesh = Mesh(devices, ("shard",))
    blk_codes, blk_invalid, block = _shard_blocks(codes, invalid, k, n_shards)
    sharding = NamedSharding(mesh, P("shard"))

    def mk(arr):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    d_codes, d_invalid = mk(blk_codes), mk(blk_invalid)

    def make_fn(cap: int):
        def per_device(codes_blk, invalid_blk):
            codes_blk = codes_blk.reshape(-1)
            invalid_blk = invalid_blk.reshape(-1)
            hi, lo, valid = extract_canonical(codes_blk, invalid_blk, k)
            recv_hi, recv_lo, mine, any_overflow = route_to_owners(
                hi, lo, valid, n_shards, cap
            )
            uhi, ulo, cnt, nu = count_kmers(recv_hi, recv_lo, mine)
            # replicate per-shard RESULTS so out_specs can be P(None) and
            # every process reads them locally (no cross-host device
            # fetch); unlike the pre-round-5 path, the full extracted
            # stream is never replicated -- only routed shares cross the
            # network
            return (
                jax.lax.all_gather(uhi, "shard"),
                jax.lax.all_gather(ulo, "shard"),
                jax.lax.all_gather(cnt, "shard"),
                jax.lax.all_gather(nu, "shard"),
                jax.lax.all_gather(any_overflow, "shard"),
            )

        # check_vma=False: the all_gather-replicated outputs are
        # replicated by construction, but shard_map cannot statically
        # infer that
        return jax.jit(
            jax.shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P("shard"), P("shard")),
                out_specs=(
                    P(None, None),
                    P(None, None),
                    P(None, None),
                    P(None),
                    P(None),
                ),
                check_vma=False,
            )
        )

    positions = max(int(codes.shape[0]), 1)
    route_dispatches = 0
    a2a_bytes_sent = 0
    cap = int(math.ceil(capacity_factor * block / n_shards))
    for _attempt in range(4):
        uhi, ulo, cnt, nu, ovf = map(np.asarray, make_fn(cap)(d_codes, d_invalid))
        route_dispatches += 1
        # every shard sends S*cap elements x 8 B (hi+lo u32 planes)
        a2a_bytes_sent += n_shards * (n_shards * cap) * 8
        if int(ovf.max()) == 0:
            break
        cap *= 2  # exact: retry with more headroom
    else:
        raise RuntimeError("multihost a2a route overflowed at 16x capacity")
    if stats is not None:
        stats.update(
            {
                "k": k,
                "route": "pair-a2a",
                "n_shards": n_shards,
                "n_processes": jax.process_count(),
                "positions": positions,
                "route_dispatches": route_dispatches,
                "a2a_capacity": cap,
                "a2a_bytes_per_position": round(a2a_bytes_sent / positions, 3),
                "ici_bytes_per_position": round(
                    a2a_bytes_sent * (n_shards - 1) / n_shards / positions, 3
                ),
            }
        )
    vals_parts, cnt_parts = [], []
    for s in range(n_shards):
        m = int(nu[s])
        vals_parts.append(join_u64(uhi[s, :m], ulo[s, :m]))
        cnt_parts.append(cnt[s, :m].astype(np.int64))
    vals = np.concatenate(vals_parts)
    counts = np.concatenate(cnt_parts)
    order = np.argsort(vals)
    return vals[order], counts[order]


_SMOKE_WORKER = '''
import json, os, sys
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

stats = {}
vals, counts = multihost_sharded_count(codes, invalid, k, stats=stats)

from orion_kmer_tpu import codec
exp_v, exp_c = np.unique(codec.extract_kmers_np(codes, k), return_counts=True)
np.testing.assert_array_equal(vals, exp_v)
np.testing.assert_array_equal(counts, exp_c)
out = sys.argv[1]
with open(out, "w") as f:
    f.write(f"ok {jax.process_index()} {vals.shape[0]} " + json.dumps(stats))
'''


def run_two_process_smoke(work_dir, timeout: float = 240.0) -> dict:
    """Spawn a 2-process jax.distributed run (2 CPU devices each -> a
    4-device cross-process mesh), each process oracle-checking one
    hash-range-sharded count step (the DCN-analog composition of
    sharded.sharded_count).  Raises on any failure; returns
    {"processes": 2, "devices": 4, "unique": N}.

    Shared by tests/test_multihost.py and __graft_entry__'s
    dryrun_multichip (VERDICT round 2 #7: the driver artifact should
    prove the cross-process path, not just the single-process mesh).
    """
    import socket
    import subprocess
    import sys
    import time
    from pathlib import Path

    work_dir = Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    worker = work_dir / "distributed_smoke_worker.py"
    worker.write_text(_SMOKE_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = str(Path(__file__).resolve().parent.parent.parent)
    procs = []
    for pid in range(2):
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
                [sys.executable, str(worker), str(work_dir / f"smoke_out{pid}")],
                env=env,
                cwd=repo_root,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    # one shared deadline across both processes (sequential communicates
    # would allow 2x the stated timeout), and ALWAYS reap on failure: an
    # orphaned worker blocks forever in the jax.distributed coordinator
    # barrier, violating this machine's one-client process hygiene
    deadline = time.monotonic() + timeout
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=max(1.0, deadline - time.monotonic())))
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        raise RuntimeError(
            f"distributed smoke timed out after {timeout:.0f}s; workers killed"
        ) from None
    for pid, (p, (_so, se)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"distributed smoke process {pid} failed:\n{se.decode()[-3000:]}"
            )
    r0 = (work_dir / "smoke_out0").read_text()
    r1 = (work_dir / "smoke_out1").read_text()
    if not (r0.startswith("ok 0 ") and r1.startswith("ok 1 ")):
        raise RuntimeError(f"unexpected smoke outputs: {r0!r} {r1!r}")
    if r0.split()[2] != r1.split()[2]:
        raise RuntimeError(f"processes disagree on unique count: {r0!r} {r1!r}")
    import json

    stats = json.loads(r0.split(None, 3)[3]) if len(r0.split(None, 3)) > 3 else {}
    return {
        "processes": 2,
        "devices": 4,
        "unique": int(r0.split()[2]),
        "a2a_stats": stats,
    }


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from env when configured; returns True
    if a multi-process runtime is active."""
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("ORION_KMER_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator:
        return False
    num_processes = int(
        os.environ.get("ORION_KMER_NUM_PROCESSES")
        or os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    process_id = int(
        os.environ.get("ORION_KMER_PROCESS_ID") or os.environ.get("JAX_PROCESS_ID", "0")
    )
    if num_processes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d via %s",
        process_id,
        num_processes,
        coordinator,
    )
    return True
