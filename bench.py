#!/usr/bin/env python3
"""Benchmark: canonical k-mer counting throughput (BASELINE.json metric).

Measures the flagship device step -- packed 2-bit lanes -> lane-parallel
canonical k-mer extraction -> sort -> run-length-encoded counts -- at
k=31 on synthetic uniform-random sequence, on whatever accelerator JAX
selects (the driver runs this on one real TPU chip).

Timing methodology: block_until_ready is not a reliable fence on
tunneled PJRT backends, so the step threads a scalar carry through each
iteration (serializing the chain by data dependency) and a single host
fetch at the end forces completion of all iterations.

vs_baseline: the reference (motroy/orion-kmer) publishes no numbers
(BASELINE.md) and its Rust toolchain is not present in this image, so
the ratio is against a measured single-core CPU proxy: the numpy
implementation of the identical semantics (codec.extract_kmers_np +
np.unique), mirroring the reference's serial count loop
(count.rs:68-79).  The proxy's throughput is printed alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

K = 31
DEVICE_N = 1 << 20  # positions per device step (1M: best kmers/s; sort is n log n)
CPU_PROXY_N = 1 << 21  # positions for the CPU proxy measurement (2M)
ITERS = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from orion_kmer_tpu import codec
    from orion_kmer_tpu.engine import pack_for_transfer
    from orion_kmer_tpu.ops.count import count_packed

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=DEVICE_N, dtype=np.uint8)
    codes[rng.random(DEVICE_N) < 0.001] = 255  # sparse N's
    lanes_np, inv_np = pack_for_transfer(codes, DEVICE_N)

    @jax.jit
    def step(lanes, inv, carry):
        # consume the carry so no two chained iterations are identical
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        _, _, _, nu = count_packed(lanes, inv, K)
        return nu

    dl = jax.device_put(jnp.asarray(lanes_np))
    di = jax.device_put(jnp.asarray(inv_np))

    # compile + warmup
    carry = step(dl, di, jnp.int32(0))
    int(carry)  # fetch = fence

    t0 = time.perf_counter()
    carry = jnp.int32(0)
    for _ in range(ITERS):
        carry = step(dl, di, carry)
    int(carry)  # single fetch forces the whole chain
    dt = (time.perf_counter() - t0) / ITERS

    n_windows = DEVICE_N - K + 1
    device_kmers_per_s = n_windows / dt

    # Secondary metric: FracMinHash sketching throughput (Gbp/s), the
    # other half of the BASELINE.json north-star.
    from orion_kmer_tpu.ops.sketch import sketch_batch
    from orion_kmer_tpu.ops.count import unpack_lanes

    @jax.jit
    def sketch_step(lanes, inv, carry):
        inv = inv.at[0].set(inv[0] | (carry.astype(jnp.uint32) & jnp.uint32(1)))
        codes, invalid = unpack_lanes(lanes, inv)
        return sketch_batch(codes, invalid, K, 1000)[3]

    carry = sketch_step(dl, di, jnp.int32(0))
    int(carry)
    t0 = time.perf_counter()
    carry = jnp.int32(0)
    for _ in range(ITERS):
        carry = sketch_step(dl, di, carry)
    int(carry)
    sketch_dt = (time.perf_counter() - t0) / ITERS
    sketch_gbps = DEVICE_N / sketch_dt / 1e9

    # CPU proxy (single-core numpy, identical semantics)
    proxy_codes = codes[:CPU_PROXY_N]
    t0 = time.perf_counter()
    vals = codec.extract_kmers_np(proxy_codes, K)
    np.unique(vals, return_counts=True)
    cpu_dt = time.perf_counter() - t0
    cpu_kmers_per_s = (CPU_PROXY_N - K + 1) / cpu_dt

    result = {
        "metric": f"canonical k-mers/sec/chip (k={K}, extract+sort+RLE count)",
        "value": round(device_kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(device_kmers_per_s / cpu_kmers_per_s, 3),
        "baseline_def": "single-core numpy proxy of the reference's serial count loop, measured in-process",
        "cpu_proxy_kmers_per_s": round(cpu_kmers_per_s, 1),
        "device": str(jax.devices()[0]),
        "step_seconds": round(dt, 4),
        "positions_per_step": DEVICE_N,
        "sketch_gbps_scaled1000": round(sketch_gbps, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
