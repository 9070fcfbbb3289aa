"""Profile the warm CLI count steady state (VERDICT r2 item 3).

Attributes the per-batch cost of engine.count_file on a warm 100 Mbp
FASTQ: how long the consumer waits on the prefetch queue (host-side
parse/pack/transfer not keeping up, or transfer serializing with
execution) vs how long each update_packed dispatch takes (device/RTT
bound).  Run from /root/repo with the TPU backend:

    python prof_steady.py /tmp/vfy/ecoli100m.fastq [k] [batch_log2]

Prints a per-phase table and the steady-state positions/s.
"""

# runnable from /root/repo (package not installed): put repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import os
import sys
import time

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vfy/ecoli100m.fastq"
k = int(sys.argv[2]) if len(sys.argv) > 2 else 31
if len(sys.argv) > 3:
    os.environ["ORION_KMER_BATCH"] = str(1 << int(sys.argv[3]))

from orion_kmer_tpu import engine  # noqa: E402
from orion_kmer_tpu.engine import (  # noqa: E402
    DeviceCountTable,
    _prefetch,
    _staged_batches,
)

import jax  # noqa: E402

print(f"backend={jax.default_backend()} batch={engine.DEFAULT_BATCH}")

table = DeviceCountTable(k)
if jax.default_backend() == "tpu":
    table.warm(max_depth=5)

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
