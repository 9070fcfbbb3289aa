"""Chunk-sort microbench (VERDICT r3 item 5): lax.sort variants vs the
tiled mixed-dtype sort at CHUNK_POSITIONS scale.

Run ON the TPU (one client at a time):
    python tools/bench_sort.py [log2_n]

Measures, per variant, ms/iter over chained iterations (data-dependent
carry perturbs the input each round; ONE scalar checksum fetch fences
the chain -- block_until_ready is not a reliable fence here and a fetch
per iteration would measure the 28 ms tunnel RTT):

  lax_u32_u32    2-key lax.sort on (u32, u32)   -- the k=31 chunk sort
  lax_u32_u16    2-key lax.sort on (u32, u16)   -- the k=21 chunk sort
                 (measured round 3: same cost as u32_u32 -> XLA pads)
  tiled_u48      ops/sort_tiled.sort_u48_tiled  -- 6 honest B/elem
Gate for flipping ORION_KMER_TILED_SORT: tiled_u48 >= 1.3x lax_u32_u16
AND byte-identical planes (checked here each run).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ORION_KMER_TILED_SORT", "1")

import numpy as np

from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from orion_kmer_tpu.ops.sort_tiled import sort_u48_tiled

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 22
N = 1 << LOGN
ITERS = 8


def _chain(fn, args, label):
    """Compile, then time ITERS data-dependent chained runs."""

    @jax.jit
    def step(carry, *xs):
        xs = list(xs)
        xs[0] = xs[0].at[0].set(xs[0][0] ^ (carry.astype(xs[0].dtype) & 1))
        outs = fn(*xs)
        cs = jnp.uint32(0)
        for o in outs:
            cs = cs ^ jnp.sum(o.astype(jnp.uint32), dtype=jnp.uint32)
        return cs.astype(jnp.int32)

    carry = jnp.int32(0)
    int(step(carry, *args))  # compile + warm
    t0 = time.perf_counter()
    carry = jnp.int32(0)
    for _ in range(ITERS):
        carry = step(carry, *args)
    int(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:14s} {dt * 1e3:8.2f} ms  {N / dt / 1e6:8.1f} Melem/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 42, size=N, dtype=np.uint64)  # k=21 keyspace
    t = jax.device_put(jnp.asarray((vals >> np.uint64(10)).astype(np.uint32)))
    b32 = jax.device_put(jnp.asarray((vals & np.uint64(0x3FF)).astype(np.uint32)))
    b16 = jax.device_put(jnp.asarray((vals & np.uint64(0x3FF)).astype(np.uint16)))
    print(f"n = 2^{LOGN} = {N}, device = {jax.devices()[0]}", flush=True)

    # correctness gate first: tiled must be plane-exact vs lax
    st, sb = sort_u48_tiled(t, b16)
    et, eb = jax.lax.sort((t, b16), num_keys=2)
    ok_t = bool(jnp.array_equal(st, et))
    ok_b = bool(jnp.array_equal(sb, eb))
    print(f"tiled == lax planes: t={ok_t} b={ok_b}", flush=True)

    d_pair = _chain(
        lambda a, b: jax.lax.sort((a, b), num_keys=2), (t, b32), "lax_u32_u32"
    )
    d_mixed = _chain(
        lambda a, b: jax.lax.sort((a, b), num_keys=2), (t, b16), "lax_u32_u16"
    )
    d_tiled = _chain(lambda a, b: sort_u48_tiled(a, b), (t, b16), "tiled_u48")
    print(
        f"tiled speedup vs lax_u32_u16: {d_mixed / d_tiled:.3f}x "
        f"(gate >= 1.3x); vs lax_u32_u32: {d_pair / d_tiled:.3f}x",
        flush=True,
    )
    if not (ok_t and ok_b):
        print("CORRECTNESS FAILED -- do not flip the flag", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
