"""Roofline probe (VERDICT r4 item 2): per-pass floor for an O(n)-pass
radix batch sort vs the lax.sort chunk sort it would replace.

Run ON the TPU (one client at a time):
    python tools/probe_radix.py [log2_n]

The batch-sort ceiling question: the k=31 chunk sort (lax.sort on
(u32, u32) at 2^22) costs ~2.9 ms/1M elements, ~45% of the pair-path
pipeline.  The HBM-bytes bound says a sort COULD be ~10-30x cheaper
(see BASELINE.md round-5 roofline note), so per the verdict this probe
anchors the other binding constraint: the measured cost of ONE
full-array scatter-free permutation pass -- the primitive every radix
partition on this target must be built from (a b-bit digit partition
needs >= b such passes with the monotone-shift machinery, or an
in-VMEM rank kernel that Mosaic compile limits rule out at useful
block sizes; XLA scatter at ~16 ms/1M is 5x worse than doing nothing).

Go/no-go rule: a radix design beats lax.sort only if
    (passes needed) x (per-pass floor) < 2.9 ms/1M.
With 64-bit keys, even partitioning ONLY the leading 8 bits (then
65536-element sub-sorts, themselves ~2 ms/1M) needs 8 binary-partition
passes.  If the per-pass floor measures >~0.2 ms/1M, radix cannot win.

Prints one JSON line with ms/1M for: one compaction pass (the floor),
one full binary partition (both halves materialized), and lax.sort.
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

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 22
N = 1 << LOGN
ITERS = 8
PASSES = 3


def _chain(fn, args, label):
    """Compile, then best-of-PASSES over ITERS chained runs (one scalar
    fetch fences the chain; the carry perturbs inputs each round)."""

    @jax.jit
    def step(carry, *xs):
        xs = list(xs)
        xs[0] = xs[0].at[0].set(xs[0][0] ^ (carry.astype(xs[0].dtype) & 1))
        outs = fn(*xs)
        cs = jnp.uint32(0)
        for o in outs:
            cs = cs ^ jnp.sum(o.astype(jnp.uint32), dtype=jnp.uint32)
        return cs.astype(jnp.int32)

    int(step(jnp.int32(0), *args))  # compile + warm
    best = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        carry = jnp.int32(0)
        for _ in range(ITERS):
            carry = step(carry, *args)
        int(carry)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    ms_per_1m = best * 1e3 / (N / 1e6)
    print(f"{label}: {ms_per_1m:.3f} ms/1M ({best * 1e3:.2f} ms total)", flush=True)
    return ms_per_1m


def main():
    rng = np.random.default_rng(0)
    hi = jax.device_put(jnp.asarray(rng.integers(0, 1 << 32, N, np.uint64).astype(np.uint32)))
    lo = jax.device_put(jnp.asarray(rng.integers(0, 1 << 32, N, np.uint64).astype(np.uint32)))
    print(f"n = 2^{LOGN}, device = {jax.devices()[0]}", flush=True)

    from orion_kmer_tpu.ops.count import _compact_left

    def one_compaction(h, l):
        # keep = top bit of hi clear: exactly the data movement of the
        # "zeros half" of one binary radix-partition pass
        keep = (h >> jnp.uint32(31)) == 0
        ch, cl = _compact_left([h, l], keep)
        return ch, cl

    def binary_partition(h, l):
        # a FULL stable binary partition by the top bit: zeros half +
        # ones half (two compaction passes), the honest per-bit cost of
        # a monotone-shift radix partition
        bit = (h >> jnp.uint32(31)) == 0
        zh, zl = _compact_left([h, l], bit)
        oh, ol = _compact_left([h, l], ~bit)
        return zh, zl, oh, ol

    def laxsort(h, l):
        return jax.lax.sort((h, l), num_keys=2)

    compact_ms = _chain(one_compaction, (hi, lo), "compact_1pass")
    partition_ms = _chain(binary_partition, (hi, lo), "binary_partition")
    laxsort_ms = _chain(laxsort, (hi, lo), "laxsort_u32_u32")

    print(
        json.dumps(
            {
                "log2_n": LOGN,
                "compact_1pass_ms_per_1M": round(compact_ms, 3),
                "binary_partition_ms_per_1M": round(partition_ms, 3),
                "laxsort_ms_per_1M": round(laxsort_ms, 3),
                # leading-byte partition (8 bits) + 2^(LOGN-8) sub-sorts:
                # the cheapest radix split that makes sub-sorts tractable
                "radix8_estimate_ms_per_1M": round(8 * partition_ms, 3),
                "go": bool(8 * partition_ms < laxsort_ms),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
