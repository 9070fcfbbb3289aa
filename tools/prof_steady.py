"""Profile the warm CLI count steady state (VERDICT r2 item 3).

Attributes the per-batch cost of engine.count_file on a warm 100 Mbp
FASTQ: how long the consumer waits on the prefetch queue (host-side
parse/pack/transfer not keeping up, or transfer serializing with
execution) vs how long each update_packed dispatch takes (device/RTT
bound).  Run from /root/repo with the TPU backend:

    python tools/prof_steady.py /tmp/vfy/ecoli100m.fastq [k] [batch_log2] [warm_depth]

Prints a per-phase table and the steady-state positions/s.
"""

# runnable from /root/repo (package not installed): put repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vfy/ecoli100m.fastq"
k = int(sys.argv[2]) if len(sys.argv) > 2 else 31
if len(sys.argv) > 3:
    os.environ["ORION_KMER_BATCH"] = str(1 << int(sys.argv[3]))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize re-selects the TPU platform programmatically;
    # the env var alone does not stick (CLAUDE.md)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from orion_kmer_tpu import engine  # noqa: E402
from orion_kmer_tpu.engine import (  # noqa: E402
    DeviceCountTable,
    _prefetch,
    _staged_batches,
)

import jax  # noqa: E402

print(f"backend={jax.default_backend()} batch={engine.default_batch()}")

warm_depth = int(sys.argv[4]) if len(sys.argv) > 4 else 5
table = DeviceCountTable(k)
if jax.default_backend() == "tpu":
    table.warm(max_depth=warm_depth)

# --- microprobes: the three candidate bottlenecks in isolation ---
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# (a) scalar round-trip (dispatch+fetch RTT floor)
x = jax.device_put(jnp.arange(1024, dtype=jnp.int32))
int(x.sum())
t0 = time.monotonic()
for _ in range(8):
    int(x.sum())
rtt_ms = (time.monotonic() - t0) / 8 * 1e3

# (b) host->device link: one batch worth of wire data (lanes + inv)
lanes_h = np.zeros(engine.default_batch() // 16, np.uint32)
inv_h = np.zeros(engine.default_batch() // 32, np.uint32)
nbytes = lanes_h.nbytes + inv_h.nbytes
int(jnp.asarray(lanes_h).sum())  # warm the transfer+sum programs
t0 = time.monotonic()
for _ in range(4):
    a = jnp.asarray(lanes_h)
    b = jnp.asarray(inv_h)
    int(a.sum() + b.sum())  # scalar fetch = reliable fence; costs ~1 rtt
xfer_ms = (time.monotonic() - t0) / 4 * 1e3 - rtt_ms
print(
    f"microprobe: scalar rtt {rtt_ms:.1f} ms; "
    f"batch transfer {xfer_ms:.1f} ms ({nbytes / 1e6:.2f} MB -> "
    f"{nbytes / 1e6 / (xfer_ms / 1e3):.1f} MB/s)",
    flush=True,
)

# (c) pure dispatch+compute: update_packed on pre-staged device arrays,
# fenced once via the flush scalar (no per-iter transfer, no fetch)
dl = jax.device_put(jnp.asarray(lanes_h))
di = jax.device_put(jnp.full(engine.default_batch() // 32, 0xFFFFFFFF, jnp.uint32))
t2 = DeviceCountTable(k)
iters = 8
t0 = time.monotonic()
for _ in range(iters):
    t2.update_packed(dl, di, engine.default_batch(), engine.default_batch())
# fence on the merged key planes themselves (an output fetch waits for
# the producing program; n_valid alone wouldn't force the merges)
total_n = sum(int(r[0][0]) + int(r[-1]) for r in t2._runs.values())
disp_only_ms = (time.monotonic() - t0) / iters * 1e3
print(
    f"microprobe: device-resident update_packed {disp_only_ms:.1f} ms/batch "
    f"({engine.default_batch() / (disp_only_ms / 1e3) / 1e6:.0f}M pos/s)",
    flush=True,
)
del t2

wait_s = 0.0  # consumer blocked on prefetch queue (host/transfer bound)
disp_s = 0.0  # update_packed dispatch time (enqueue; async unless it blocks)
n_batches = 0
positions = 0
t_start = time.monotonic()
stream = _prefetch(_staged_batches(path, k, True))
it = iter(stream)
per_batch = []
while True:
    t0 = time.monotonic()
    try:
        lanes, inv_words, size, n = next(it)
    except StopIteration:
        break
    t1 = time.monotonic()
    table.update_packed(lanes, inv_words, size, n)
    t2 = time.monotonic()
    wait_s += t1 - t0
    disp_s += t2 - t1
    per_batch.append((t1 - t0, t2 - t1, n))
    n_batches += 1
    positions += n
t_stream = time.monotonic() - t_start

t3 = time.monotonic()
vals, cnts = table.result()
t_flush = time.monotonic() - t3

total = time.monotonic() - t_start
print(
    f"batches={n_batches} positions={positions/1e6:.1f}M "
    f"stream={t_stream:.1f}s flush+fetch={t_flush:.1f}s total={total:.1f}s"
)
print(
    f"  queue-wait {wait_s:.1f}s ({wait_s/max(n_batches,1)*1e3:.1f} ms/batch)  "
    f"dispatch {disp_s:.1f}s ({disp_s/max(n_batches,1)*1e3:.1f} ms/batch)"
)
print(f"  steady rate {positions/max(t_stream,1e-9)/1e6:.1f}M positions/s")
print(f"  uniques={vals.shape[0]} checksum={int(cnts.sum())}")
# the last few batches show the steady state best (first ones hide
# compile/load noise); also show the worst 5 to spot merge-chain spikes
tail = per_batch[-8:]
print("  tail batches (wait_ms, dispatch_ms, n):")
for w, d, n in tail:
    print(f"    {w*1e3:8.1f} {d*1e3:8.1f} {n}")
worst = sorted(per_batch, key=lambda t: -(t[0] + t[1]))[:5]
print("  worst batches:")
for w, d, n in worst:
    print(f"    {w*1e3:8.1f} {d*1e3:8.1f} {n}")
