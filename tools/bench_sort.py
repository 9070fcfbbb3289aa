"""Chunk-sort microbench (VERDICT r3 item 5) at CHUNK_POSITIONS scale.

Run ON the TPU (one client at a time):
    python tools/bench_sort.py [log2_n]

Measures, per variant, ms/iter over chained iterations (data-dependent
carry perturbs the input each round; ONE scalar checksum fetch fences
the chain -- block_until_ready is not a reliable fence here and a fetch
per iteration would measure the 28 ms tunnel RTT):

  lax_u32_u32    2-key lax.sort on (u32, u32)   -- the k=31 chunk sort
  lax_u32_u16    2-key lax.sort on (u32, u16)   -- the k=21 chunk sort

RESULT HISTORY (TPU v5e):
  round 3: lax (u32, u16) == lax (u32, u32) per element -- XLA pads the
  u16 operand to u32, so key narrowing buys nothing in the sort itself.
  round 4 @b1b261f: a tiled mixed-dtype bitonic sort (ops/sort_tiled.py,
  honest 6 B/element through every Pallas stage, plane-exact on chip)
  measured 19.70 ms vs lax's 11.40 ms at 2^22 = 0.58x -- the
  O(n log^2 n) network loses more than the 25% byte cut buys.  The
  module was deleted (gate was >= 1.3x); code in git history @b1b261f.
  Beating lax.sort here needs an O(n)-pass radix design, not a better
  bitonic network.
"""

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

    d_pair = _chain(
        lambda a, b: jax.lax.sort((a, b), num_keys=2), (t, b32), "lax_u32_u32"
    )
    d_mixed = _chain(
        lambda a, b: jax.lax.sort((a, b), num_keys=2), (t, b16), "lax_u32_u16"
    )
    print(f"lax (u32,u16) vs (u32,u32): {d_pair / d_mixed:.3f}x", flush=True)


if __name__ == "__main__":
    main()
