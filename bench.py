#!/usr/bin/env python3
"""Benchmark: sustained exact canonical k-mer counting (BASELINE.json).

Headline: the full device counting pipeline at k=31 -- wire-format
lane extraction, chunked sorts + bitonic-merge tree per batch
(ops.count.sort_canonical_packed), LSM merge-forest accumulation
across batches (engine.DeviceCountTable), and the scatter-free
run-length compaction at flush (ops.count.rle_compact) -- measured
over 32M positions of synthetic uniform-random sequence on whatever
accelerator JAX selects.  A device-side checksum of the final unique
table is fetched as a scalar, so nothing in the pipeline can be
dead-code eliminated and the single fetch fences the whole chain
(block_until_ready is not a reliable fence on tunneled PJRT backends).
The final host transfer of the unique table is excluded: this machine
reaches its chip through a ~20 MB/s tunnel, which would measure the
tunnel, not the engine.

Secondary metrics: the per-batch device step alone (extract + sort,
no accumulation), and FracMinHash sketching throughput in Gbp/s.

vs_baseline: the reference (motroy/orion-kmer) publishes no numbers
(BASELINE.md) and its Rust toolchain is not in this image, so the
ratio is against a measured single-core CPU proxy: the numpy
implementation of identical semantics (codec.extract_kmers_np +
np.unique), mirroring the reference's serial count loop
(count.rs:68-79).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

K = 31
# Positions per pipeline batch: resolved in main() to the engine's
# backend-dependent default (2^24 on TPU since the round-4 steady-state
# A/B, 2^22 elsewhere) so the bench measures the config a user actually
# gets.  ORION_KMER_BATCH overrides both the engine and this.
BATCH = 0
N_BATCHES = 8  # x BATCH positions total (128M at the TPU default)
N_DISTINCT = 4  # distinct batches cycled (device memory stays bounded)
CPU_PROXY_N = 1 << 21
QUERY_DB_N = 1 << 22  # DB uniques for the query metric (A/B: tools/vfy_query_ab.py)
QUERY_READS = 4096

# Tunnel-outage resilience (round-3 postmortem: BENCH_r03.json was empty
# because the driver's bench run landed inside a >4 h tunnel outage and
# bench.py died on the first backend touch).  Before the main process
# contacts the device, probe it in a SUBPROCESS under a hard timeout --
# the outage's failure mode is a hang in the claim retry loop, not an
# exception, so only an external timeout bounds it.  Retry ~every 12 min
# for up to 75 min (one client at a time per CLAUDE.md), then give up
# with a nonzero exit: a transient outage degrades to a late number, a
# long one to a diagnosed failure instead of a silent empty artifact.
PROBE_TIMEOUT_S = 300  # warm tiny-op ~1.5 s; a cold CLAIM was measured at 126 s
PROBE_INTERVAL_S = 12 * 60
PROBE_MAX_WAIT_S = 75 * 60


def _subprocess_probe() -> bool:
    """Run the tiny-op tunnel probe in a subprocess with a hard timeout."""
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "vfy_probe.py")
    try:
        rc = subprocess.run(
            [sys.executable, probe],
            timeout=PROBE_TIMEOUT_S,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(
    probe=_subprocess_probe,
    max_wait_s: float = PROBE_MAX_WAIT_S,
    interval_s: float = PROBE_INTERVAL_S,
    sleep=time.sleep,
    clock=time.monotonic,
) -> bool:
    """Bounded probe-and-retry loop for the tunneled TPU backend.

    Returns True as soon as one probe succeeds; False once max_wait_s has
    elapsed without one.  Injectable probe/sleep/clock keep this testable
    without a device (tests/test_bench_resilience.py).
    """
    deadline = clock() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        if probe():
            return True
        remaining = deadline - clock()
        if remaining <= 0:
            return False
        print(
            f"bench: device probe attempt {attempt} failed; "
            f"retrying in {min(interval_s, remaining):.0f}s "
            f"({remaining / 60:.0f} min left in budget)",
            file=sys.stderr,
            flush=True,
        )
        sleep(min(interval_s, remaining))


def main() -> None:
    # Probe before the first in-process backend touch: an outage hangs
    # the client in the claim retry loop, which no in-process timeout
    # can bound.  Skip under explicitly-CPU runs (tests, local dev).
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and not wait_for_backend():
        print("bench: device unreachable after bounded retry; aborting", file=sys.stderr)
        raise SystemExit(1)

    import jax
    import jax.numpy as jnp

    from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from orion_kmer_tpu import codec
    from orion_kmer_tpu.engine import DeviceCountTable, default_batch, pack_for_transfer
    from orion_kmer_tpu.ops.count import rle_compact, sort_canonical_packed

    global BATCH
    BATCH = BATCH or default_batch()
    passes = int(os.environ.get("ORION_KMER_BENCH_PASSES", "3"))
    # per-metric spread [min, median, max] across timing passes: single-
    # shot device metrics on a shared chip are not evidence (VERDICT r4
    # missing #3) -- the artifact must carry its own variance story
    spread: dict[str, list[float]] = {}

    def record(name: str, per_pass_rates: list[float], digits: int = 1) -> float:
        r = sorted(per_pass_rates)
        spread[name] = [
            round(r[0], digits),
            round(r[len(r) // 2], digits),
            round(r[-1], digits),
        ]
        return r[-1]  # best of N (min time): the chip's capability

    def time_chained(step_fn, iters: int = 16) -> list[float]:
        """Per-iteration seconds for `passes` runs of `iters` chained
        dispatches fenced by one scalar fetch (see module docstring)."""
        import jax.numpy as _jnp

        int(step_fn(_jnp.int32(0)))  # compile + warm
        dts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            carry = _jnp.int32(0)
            for _ in range(iters):
                carry = step_fn(carry)
            int(carry)
            dts.append((time.perf_counter() - t0) / iters)
        return dts

    rng = np.random.default_rng(0)
    batches = []
    first_codes = None
    for _ in range(N_DISTINCT):
        codes = rng.integers(0, 4, size=BATCH, dtype=np.uint8)
        codes[rng.random(BATCH) < 0.001] = 255  # sparse N's
        if first_codes is None:
            first_codes = codes
        lanes, inv = pack_for_transfer(codes, BATCH)
        batches.append(
            (jax.device_put(jnp.asarray(lanes)), jax.device_put(jnp.asarray(inv)))
        )

    @jax.jit
    def checksum(hi, lo, cnt, nu):
        return (
            jnp.sum(hi, dtype=jnp.uint32)
            ^ jnp.sum(lo, dtype=jnp.uint32)
            ^ jnp.sum(cnt.astype(jnp.uint32))
        ) + nu.astype(jnp.uint32)

    def pipeline(k: int) -> int:
        # generic over the pair-plane k-classes: k=31 runs the (hi, lo)
        # path, k=21 the narrowed (t u32, b u16) u48 path -- both keep
        # 3-tuple (plane, plane, n) runs, so the flush checksum is shared
        table = DeviceCountTable(k)
        for i in range(N_BATCHES):
            lanes, inv = batches[i % N_DISTINCT]
            table.update_packed(lanes, inv, BATCH, BATCH)
        cs = jnp.uint32(0)
        for cap in sorted(table._runs):
            hi, lo, n_dev = table._runs[cap]
            cs = cs ^ checksum(*rle_compact(hi, lo, n_dev))
        return int(cs)  # single scalar fetch = fence; forces everything

    def run_pipeline(k: int) -> list[float]:
        pipeline(k)  # compile + warm every shape in the forest
        windows = N_BATCHES * (BATCH - k + 1)
        rates = []
        for _ in range(passes):
            t0 = time.perf_counter()
            pipeline(k)
            rates.append(windows / (time.perf_counter() - t0))
        return rates

    rates31 = run_pipeline(K)
    sustained_kmers_per_s = record("sustained_k31", rates31)
    best = (N_BATCHES * (BATCH - K + 1)) / sustained_kmers_per_s

    # k=21: the other half of the BASELINE.json north-star metric --
    # full pipeline on the 32 < 2k <= 48 narrowed-key path.
    K21 = 21
    sustained_k21_kmers_per_s = record("sustained_k21", run_pipeline(K21))

    # Secondary: the per-batch device step alone (extract + global sort),
    # checksum-consumed so nothing is DCE'd.
    @jax.jit
    def step(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        shi, slo, nv = sort_canonical_packed(lanes, inv, K)
        return (
            jnp.sum(shi, dtype=jnp.uint32) ^ jnp.sum(slo, dtype=jnp.uint32)
        ).astype(jnp.int32) + nv

    dl, di = batches[0]
    step_kmers_per_s = record(
        "batch_step_k31",
        [(BATCH - K + 1) / dt for dt in time_chained(lambda c: step(dl, di, c))],
    )

    # Secondary: the k=15 single-plane batch step (2k <= 32 pipeline:
    # 1-key sort, one value plane -- half the sort bandwidth).
    from orion_kmer_tpu.ops.count import sort_canonical_packed_single

    @jax.jit
    def step15(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        slo, nv = sort_canonical_packed_single(lanes, inv, 15)
        return jnp.sum(slo, dtype=jnp.uint32).astype(jnp.int32) + nv

    step15_kmers_per_s = record(
        "batch_step_k15",
        [(BATCH - 15 + 1) / dt for dt in time_chained(lambda c: step15(dl, di, c))],
    )

    # Secondary: the k=21 batch step on the narrowed-key u48 path
    # ((t u32, b u16) chunk sorts: 6 bytes/element instead of 8).
    from orion_kmer_tpu.ops.count import sort_canonical_packed_u48

    @jax.jit
    def step21(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        st, sb, nv = sort_canonical_packed_u48(lanes, inv, 21)
        return (
            jnp.sum(st, dtype=jnp.uint32) ^ jnp.sum(sb, dtype=jnp.uint32)
        ).astype(jnp.int32) + nv

    step21_kmers_per_s = record(
        "batch_step_k21_u48",
        [(BATCH - 21 + 1) / dt for dt in time_chained(lambda c: step21(dl, di, c))],
    )

    # Secondary: FracMinHash sketching throughput (Gbp/s), wire-format path.
    from orion_kmer_tpu.ops.sketch import sketch_packed

    @jax.jit
    def sketch_step(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        h, l, c, nu, _ovf = sketch_packed(lanes, inv, K, 1000)
        return (
            jnp.sum(h, dtype=jnp.uint32) ^ jnp.sum(c.astype(jnp.uint32))
        ).astype(jnp.int32) + nu

    sketch_gbps = record(
        "sketch_gbps",
        [BATCH / dt / 1e9 for dt in time_chained(lambda c: sketch_step(dl, di, c))],
        digits=3,
    )

    # Secondary: query throughput (windows screened against a DB set,
    # multiplicity hit counting -- query.rs:87-94 semantics).
    from orion_kmer_tpu.engine import _query_step_packed

    db_n = QUERY_DB_N
    dbv = np.unique(rng.integers(0, 1 << 62, size=db_n, dtype=np.uint64))
    db_hi = jax.device_put(jnp.asarray((dbv >> np.uint64(32)).astype(np.uint32)))
    db_lo = jax.device_put(jnp.asarray(dbv.astype(np.uint32)))
    db_valid = jax.device_put(jnp.ones(dbv.shape[0], dtype=bool))
    nr = QUERY_READS
    starts = jnp.asarray(
        np.sort(rng.choice(BATCH, size=nr, replace=False)).astype(np.int32)
    )

    # db/starts passed as ARGUMENTS: closed-over device arrays embed as
    # executable constants (a 134 MB program, ~10 min to compile)
    @jax.jit
    def query_step(lanes, inv, starts_, dbh, dbl, dbv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        hits = _query_step_packed(
            lanes, inv, starts_, dbh, dbl, dbv, K, nr, jnp.int32(BATCH)
        )
        return jnp.sum(hits, dtype=jnp.int32) & 0x7FFF

    query_windows_per_s = record(
        "query_windows",
        [
            (BATCH - K + 1) / dt
            for dt in time_chained(
                lambda c: query_step(dl, di, starts, db_hi, db_lo, db_valid, c)
            )
        ],
    )

    # CPU proxy (single-core numpy, identical semantics; best of 3 --
    # the shared host's load makes single runs noisy)
    proxy_codes = first_codes[:CPU_PROXY_N]
    cpu_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        vals = codec.extract_kmers_np(proxy_codes, K)
        np.unique(vals, return_counts=True)
        cpu_dt = min(cpu_dt, time.perf_counter() - t0)
    cpu_kmers_per_s = (CPU_PROXY_N - K + 1) / cpu_dt

    result = {
        "metric": (
            f"sustained canonical k-mers/sec/chip (k={K}, full exact count "
            "pipeline: extract+sort+merge-forest+RLE)"
        ),
        "value": round(sustained_kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(sustained_kmers_per_s / cpu_kmers_per_s, 3),
        "baseline_def": (
            "single-core numpy proxy of the reference's serial count loop, "
            "measured in-process"
        ),
        "cpu_proxy_kmers_per_s": round(cpu_kmers_per_s, 1),
        "device": str(jax.devices()[0]),
        "total_positions": N_BATCHES * BATCH,
        "pipeline_seconds": round(best, 4),
        "batch_step_kmers_per_s": round(step_kmers_per_s, 1),
        "sustained_k21_kmers_per_s": round(sustained_k21_kmers_per_s, 1),
        "batch_step_k21_u48_kmers_per_s": round(step21_kmers_per_s, 1),
        "batch_step_k15_single_plane_kmers_per_s": round(step15_kmers_per_s, 1),
        "sketch_gbps_scaled1000": round(sketch_gbps, 3),
        "query_windows_per_s": round(query_windows_per_s, 1),
        "timing_passes": passes,
        "spread_min_med_max": spread,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
