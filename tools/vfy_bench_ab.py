"""Driver-bench anomaly pinning (VERDICT r4 item 1b/1c).

Run ON the TPU (one client at a time):
    python tools/vfy_bench_ab.py

Two questions BENCH_r04 left open:

  (b) query 54.9M windows/s vs 87-99M interactive (-45%): load noise,
      or a real regression from the round-4 2^24-batch default?
      -> A/B the query step over BATCH x DB in {2^22, 2^24}^2,
         3 passes each, same chained-carry methodology as bench.py.

  (c) the k=21 sustained advantage (+10.6% interactive) reading as
      0.0% in the driver artifact: if the u48 merge-tier win is
      RTT-sensitive, alternating k31/k21 pipelines in ONE process
      under the same load should still show the gap, and the
      per-dispatch RTT estimate lets us subtract dispatch overhead.
      -> interleave sustained k31/k21 runs, plus an RTT probe.

Prints one JSON line with every measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from orion_kmer_tpu.engine import DeviceCountTable, _query_step_packed, pack_for_transfer
from orion_kmer_tpu.ops.count import rle_compact

K = 31
N_BATCHES = 8
PASSES = 3
ITERS = 16


def make_batches(batch: int, n_distinct: int = 4):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n_distinct):
        codes = rng.integers(0, 4, size=batch, dtype=np.uint8)
        codes[rng.random(batch) < 0.001] = 255
        lanes, inv = pack_for_transfer(codes, batch)
        out.append((jax.device_put(jnp.asarray(lanes)), jax.device_put(jnp.asarray(inv))))
    return out


def rtt_probe():
    """Per-dispatch cost: fetched-per-iter (full RTT) vs chained."""

    @jax.jit
    def tiny(x):
        return x + jnp.int32(1)

    int(tiny(jnp.int32(0)))
    t0 = time.perf_counter()
    x = jnp.int32(0)
    for _ in range(32):
        x = jnp.int32(int(tiny(x)))  # fetch every iteration
    fetch_ms = (time.perf_counter() - t0) / 32 * 1e3
    t0 = time.perf_counter()
    x = jnp.int32(0)
    for _ in range(64):
        x = tiny(x)
    int(x)
    chained_ms = (time.perf_counter() - t0) / 64 * 1e3
    return round(fetch_ms, 3), round(chained_ms, 3)


def time_chained(step_fn, iters=ITERS, passes=PASSES):
    int(step_fn(jnp.int32(0)))
    dts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        carry = jnp.int32(0)
        for _ in range(iters):
            carry = step_fn(carry)
        int(carry)
        dts.append((time.perf_counter() - t0) / iters)
    return dts


def query_ab(results):
    rng = np.random.default_rng(1)
    nr = 4096
    for db_log in (22, 24):
        dbv = np.unique(rng.integers(0, 1 << 62, size=1 << db_log, dtype=np.uint64))
        db_hi = jax.device_put(jnp.asarray((dbv >> np.uint64(32)).astype(np.uint32)))
        db_lo = jax.device_put(jnp.asarray(dbv.astype(np.uint32)))
        db_valid = jax.device_put(jnp.ones(dbv.shape[0], dtype=bool))
        for batch_log in (22, 24):
            batch = 1 << batch_log
            dl, di = make_batches(batch, 1)[0]
            starts = jnp.asarray(
                np.sort(rng.choice(batch, size=nr, replace=False)).astype(np.int32)
            )

            @jax.jit
            def query_step(lanes, inv, starts_, dbh, dbl, dbv_, carry):
                inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
                hits = _query_step_packed(
                    lanes, inv, starts_, dbh, dbl, dbv_, K, nr, jnp.int32(batch)
                )
                return jnp.sum(hits, dtype=jnp.int32) & 0x7FFF

            dts = time_chained(
                lambda c: query_step(dl, di, starts, db_hi, db_lo, db_valid, c)
            )
            rates = sorted((batch - K + 1) / dt for dt in dts)
            key = f"query_batch2^{batch_log}_db2^{db_log}"
            results[key] = [round(r, 1) for r in (rates[0], rates[1], rates[-1])]
            print(key, results[key], flush=True)
            del dl, di
        del db_hi, db_lo, db_valid


def sustained_interleave(results, batch: int):
    batches = make_batches(batch)

    @jax.jit
    def checksum(hi, lo, cnt, nu):
        return (
            jnp.sum(hi, dtype=jnp.uint32)
            ^ jnp.sum(lo, dtype=jnp.uint32)
            ^ jnp.sum(cnt.astype(jnp.uint32))
        ) + nu.astype(jnp.uint32)

    def pipeline(k):
        table = DeviceCountTable(k)
        for i in range(N_BATCHES):
            lanes, inv = batches[i % len(batches)]
            table.update_packed(lanes, inv, batch, batch)
        cs = jnp.uint32(0)
        for cap in sorted(table._runs):
            hi, lo, n_dev = table._runs[cap]
            cs = cs ^ checksum(*rle_compact(hi, lo, n_dev))
        return int(cs)

    pipeline(31)
    pipeline(21)  # warm both forests
    inter = {31: [], 21: []}
    for _ in range(PASSES):
        for k in (31, 21):  # strict alternation: same load for both
            t0 = time.perf_counter()
            pipeline(k)
            dt = time.perf_counter() - t0
            inter[k].append(N_BATCHES * (batch - k + 1) / dt)
    for k in (31, 21):
        r = sorted(inter[k])
        results[f"sustained_k{k}_interleaved"] = [
            round(x, 1) for x in (r[0], r[len(r) // 2], r[-1])
        ]
    results["k21_over_k31_best"] = round(
        max(inter[21]) / max(inter[31]), 4
    )
    results["k21_over_k31_median"] = round(
        sorted(inter[21])[PASSES // 2] / sorted(inter[31])[PASSES // 2], 4
    )
    print("interleave:", {k: results[f"sustained_k{k}_interleaved"] for k in (31, 21)},
          "ratio best", results["k21_over_k31_best"], flush=True)


def main():
    results = {"device": str(jax.devices()[0])}
    fetch_ms, chained_ms = rtt_probe()
    results["rtt_fetch_ms"] = fetch_ms
    results["dispatch_chained_ms"] = chained_ms
    print(f"rtt fetch {fetch_ms} ms, chained dispatch {chained_ms} ms", flush=True)

    query_ab(results)
    sustained_interleave(results, batch=1 << 24)

    print("AB_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
