#!/usr/bin/env python3
"""Benchmark: sustained exact canonical k-mer counting (BASELINE.json).

Headline: the full device counting pipeline at k=31 -- wire-format
lane extraction, chunked sorts + bitonic-merge tree per batch
(ops.count.sort_canonical_packed), LSM merge-forest accumulation
across batches (engine.DeviceCountTable), and the scatter-free
run-length compaction at flush (ops.count.rle_compact) -- measured
over 8 batches of synthetic uniform-random sequence on whatever
accelerator JAX selects.  A device-side checksum of the final unique
table is fetched as a scalar, so nothing in the pipeline can be
dead-code eliminated and the single fetch fences the whole chain
(block_until_ready is not a reliable fence on tunneled PJRT backends).
The final host transfer of the unique table is excluded: this machine
reaches its chip through a ~20 MB/s tunnel, which would measure the
tunnel, not the engine.

Every batch-dependent metric is measured on TWO batch bases when they
differ (round-5 reconciliation of the BENCH_r04 "anomalies"):

* the production default (2^24 positions on TPU since the round-4
  steady-state A/B -- 1.53x end-to-end through the tunnel), which the
  top-level keys report for driver continuity, and
* the 2^22 basis every round-1..3 number was recorded on, reported
  under "alt_basis".

The round-5 A/B (tools/vfy_bench_ab.py, BASELINE.md) showed the batch
base alone moves per-step metrics by up to 1.8x (query 99.5M windows/s
at 2^22 vs 54.9M at 2^24 against the same 2^22-unique DB; the k=21 u48
sustained advantage is +10% at 2^22 and ~0% at 2^24 where per-batch
chunk sorts dominate the merge forest the u48 narrowing accelerates).
Single-shot numbers on one basis are not comparable across rounds;
this artifact carries both bases plus a min/med/max spread per metric.

Secondary metrics: the per-batch device step alone (extract + sort,
no accumulation), FracMinHash sketching throughput in Gbp/s, and
query window screening throughput.

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
K21 = 21
# Positions per pipeline batch: resolved in main() to the engine's
# backend-dependent default (2^24 on TPU since the round-4 steady-state
# A/B, 2^22 elsewhere) so the headline measures the config a user
# actually gets.  ORION_KMER_BATCH overrides both the engine and this.
BATCH = 0
ALT_BATCH = 1 << 22  # rounds-1..3 comparable basis (see module docstring)
N_BATCHES = 8  # x BATCH positions per pipeline run
N_DISTINCT = 4  # distinct batches cycled (device memory stays bounded)
CPU_PROXY_N = 1 << 21
QUERY_DB_N = 1 << 22  # DB uniques for the query metric (A/B: tools/vfy_bench_ab.py)
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


def run_suite(batch: int, passes: int, rng) -> dict:
    """Measure every batch-dependent metric at one batch base.

    Returns {"batch_positions", <metric keys>, "spread_min_med_max"}.
    Best-of-N (min time) is the reported value -- the chip's capability;
    the spread carries the shared-chip variance story (VERDICT r4).
    All device arrays are local, so back-to-back suites at different
    bases do not accumulate HBM.
    """
    import jax
    import jax.numpy as jnp

    from orion_kmer_tpu import codec  # noqa: F401  (import parity with CLI)
    from orion_kmer_tpu.engine import (
        DeviceCountTable,
        _query_step_packed,
        pack_for_transfer,
    )
    from orion_kmer_tpu.ops.count import (
        rle_compact,
        sort_canonical_packed,
        sort_canonical_packed_single,
        sort_canonical_packed_u48,
    )
    from orion_kmer_tpu.ops.sketch import sketch_packed

    spread: dict[str, list[float]] = {}

    def record(name: str, per_pass_rates: list[float], digits: int = 1) -> float:
        r = sorted(per_pass_rates)
        spread[name] = [
            round(r[0], digits),
            round(r[len(r) // 2], digits),
            round(r[-1], digits),
        ]
        return r[-1]

    def time_chained(step_fn, iters: int = 16) -> list[float]:
        """Per-iteration seconds for `passes` runs of `iters` chained
        dispatches fenced by one scalar fetch (see module docstring)."""
        int(step_fn(jnp.int32(0)))  # compile + warm
        dts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            carry = jnp.int32(0)
            for _ in range(iters):
                carry = step_fn(carry)
            int(carry)
            dts.append((time.perf_counter() - t0) / iters)
        return dts

    batches = []
    first_codes = None
    for _ in range(N_DISTINCT):
        codes = rng.integers(0, 4, size=batch, dtype=np.uint8)
        codes[rng.random(batch) < 0.001] = 255  # sparse N's
        if first_codes is None:
            first_codes = codes
        lanes, inv = pack_for_transfer(codes, batch)
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
            table.update_packed(lanes, inv, batch, batch)
        cs = jnp.uint32(0)
        for cap in sorted(table._runs):
            hi, lo, n_dev = table._runs[cap]
            cs = cs ^ checksum(*rle_compact(hi, lo, n_dev))
        return int(cs)  # single scalar fetch = fence; forces everything

    def run_pipeline(k: int) -> list[float]:
        pipeline(k)  # compile + warm every shape in the forest
        windows = N_BATCHES * (batch - k + 1)
        rates = []
        for _ in range(passes):
            t0 = time.perf_counter()
            pipeline(k)
            rates.append(windows / (time.perf_counter() - t0))
        return rates

    rates31 = run_pipeline(K)
    sustained_k31 = record("sustained_k31", rates31)
    pipeline_seconds = (N_BATCHES * (batch - K + 1)) / sustained_k31

    # k=21: the other half of the BASELINE.json north-star metric --
    # full pipeline on the 32 < 2k <= 48 narrowed-key path.
    sustained_k21 = record("sustained_k21", run_pipeline(K21))

    # Per-batch device step alone (extract + global sort), checksum-
    # consumed so nothing is DCE'd.
    @jax.jit
    def step(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        shi, slo, nv = sort_canonical_packed(lanes, inv, K)
        return (
            jnp.sum(shi, dtype=jnp.uint32) ^ jnp.sum(slo, dtype=jnp.uint32)
        ).astype(jnp.int32) + nv

    dl, di = batches[0]
    step_k31 = record(
        "batch_step_k31",
        [(batch - K + 1) / dt for dt in time_chained(lambda c: step(dl, di, c))],
    )

    # k=15 single-plane batch step (2k <= 32 pipeline: 1-key sort, one
    # value plane -- half the sort bandwidth).
    @jax.jit
    def step15(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        slo, nv = sort_canonical_packed_single(lanes, inv, 15)
        return jnp.sum(slo, dtype=jnp.uint32).astype(jnp.int32) + nv

    step_k15 = record(
        "batch_step_k15",
        [(batch - 15 + 1) / dt for dt in time_chained(lambda c: step15(dl, di, c))],
    )

    # k=21 batch step on the narrowed-key u48 path ((t u32, b u16)
    # chunk sorts: 6 bytes/element instead of 8).
    @jax.jit
    def step21(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        st, sb, nv = sort_canonical_packed_u48(lanes, inv, K21)
        return (
            jnp.sum(st, dtype=jnp.uint32) ^ jnp.sum(sb, dtype=jnp.uint32)
        ).astype(jnp.int32) + nv

    step_k21 = record(
        "batch_step_k21_u48",
        [(batch - K21 + 1) / dt for dt in time_chained(lambda c: step21(dl, di, c))],
    )

    # FracMinHash sketching throughput (Gbp/s), wire-format path.
    @jax.jit
    def sketch_step(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        h, l, c, nu, _ovf = sketch_packed(lanes, inv, K, 1000)
        return (
            jnp.sum(h, dtype=jnp.uint32) ^ jnp.sum(c.astype(jnp.uint32))
        ).astype(jnp.int32) + nu

    sketch_gbps = record(
        "sketch_gbps",
        [batch / dt / 1e9 for dt in time_chained(lambda c: sketch_step(dl, di, c))],
        digits=3,
    )

    # Query throughput (windows screened against a DB set, multiplicity
    # hit counting -- query.rs:87-94 semantics).  DB size is held at
    # QUERY_DB_N on both bases so the batch base is the only variable;
    # the batch x DB interaction itself is tools/vfy_bench_ab.py's job.
    dbv = np.unique(rng.integers(0, 1 << 62, size=QUERY_DB_N, dtype=np.uint64))
    db_hi = jax.device_put(jnp.asarray((dbv >> np.uint64(32)).astype(np.uint32)))
    db_lo = jax.device_put(jnp.asarray(dbv.astype(np.uint32)))
    db_valid = jax.device_put(jnp.ones(dbv.shape[0], dtype=bool))
    nr = QUERY_READS
    starts = jnp.asarray(
        np.sort(rng.choice(batch, size=nr, replace=False)).astype(np.int32)
    )

    # db/starts passed as ARGUMENTS: closed-over device arrays embed as
    # executable constants (a 134 MB program, ~10 min to compile)
    @jax.jit
    def query_step(lanes, inv, starts_, dbh, dbl, dbv_, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        hits = _query_step_packed(
            lanes, inv, starts_, dbh, dbl, dbv_, K, nr, jnp.int32(batch)
        )
        return jnp.sum(hits, dtype=jnp.int32) & 0x7FFF

    query_windows = record(
        "query_windows",
        [
            (batch - K + 1) / dt
            for dt in time_chained(
                lambda c: query_step(dl, di, starts, db_hi, db_lo, db_valid, c)
            )
        ],
    )

    return {
        "batch_positions": batch,
        "total_positions": N_BATCHES * batch,
        "pipeline_seconds": round(pipeline_seconds, 4),
        "sustained_k31_kmers_per_s": round(sustained_k31, 1),
        "sustained_k21_kmers_per_s": round(sustained_k21, 1),
        "batch_step_kmers_per_s": round(step_k31, 1),
        "batch_step_k21_u48_kmers_per_s": round(step_k21, 1),
        "batch_step_k15_single_plane_kmers_per_s": round(step_k15, 1),
        "sketch_gbps_scaled1000": round(sketch_gbps, 3),
        "query_windows_per_s": round(query_windows, 1),
        "spread_min_med_max": spread,
        "_first_codes": first_codes,  # stripped by main(); feeds the CPU proxy
    }


def main() -> None:
    # Probe before the first in-process backend touch: an outage hangs
    # the client in the claim retry loop, which no in-process timeout
    # can bound.  Skip under explicitly-CPU runs (tests, local dev).
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and not wait_for_backend():
        print("bench: device unreachable after bounded retry; aborting", file=sys.stderr)
        raise SystemExit(1)

    import jax

    from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from orion_kmer_tpu import codec
    from orion_kmer_tpu.engine import default_batch

    batch = BATCH or default_batch()
    passes = int(os.environ.get("ORION_KMER_BENCH_PASSES", "3"))

    rng = np.random.default_rng(0)
    suite = run_suite(batch, passes, rng)
    first_codes = suite.pop("_first_codes")

    # Alt-basis pass: same metrics on the rounds-1..3 2^22 basis so the
    # artifact is cross-round comparable (see module docstring).  Skipped
    # when the default IS 2^22 (CPU runs) or under ORION_KMER_BENCH_ALT=0.
    alt = None
    if batch != ALT_BATCH and os.environ.get("ORION_KMER_BENCH_ALT", "1") != "0":
        alt = run_suite(ALT_BATCH, passes, np.random.default_rng(1))
        alt.pop("_first_codes")

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

    sustained = suite["sustained_k31_kmers_per_s"]
    result = {
        "metric": (
            f"sustained canonical k-mers/sec/chip (k={K}, full exact count "
            "pipeline: extract+sort+merge-forest+RLE)"
        ),
        "value": sustained,
        "unit": "kmers/s",
        "vs_baseline": round(sustained / cpu_kmers_per_s, 3),
        "baseline_def": (
            "single-core numpy proxy of the reference's serial count loop, "
            "measured in-process"
        ),
        "cpu_proxy_kmers_per_s": round(cpu_kmers_per_s, 1),
        "device": str(jax.devices()[0]),
        "timing_passes": passes,
        **suite,
    }
    if alt is not None:
        result["alt_basis"] = alt
        result["basis_note"] = (
            "top-level = production default batch; alt_basis = the 2^22 "
            "base rounds 1-3 reported on (query/k21 deltas between bases "
            "are batch-base effects, not regressions -- BASELINE.md r5)"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
