"""Verification fixture generator (host-only, no jax).

    python tools/vfy_gen.py            # the CLI-matrix fixtures
    python tools/vfy_gen.py --steady   # + /tmp/vfy/ecoli100m.fastq (100 Mbp)
"""
import gzip
import os
import sys

import numpy as np

os.makedirs("/tmp/vfy", exist_ok=True)

rng = np.random.default_rng(42)
B = b"ACGT"

def rand_seq(n, rng):
    return bytes(rng.choice(list(B), size=n).astype(np.uint8))

# steady-state profiling fixture (tools/vfy_steady_drive.sh): 100 Mbp of
# 150 bp FASTQ reads.  The original was trimmed from an E. coli-like
# synthetic read set; on regeneration uniform-random reads are
# equivalent -- prof_steady.py measures throughput, not content.
if "--steady" in sys.argv:
    path = "/tmp/vfy/ecoli100m.fastq"
    if not os.path.exists(path):
        srng = np.random.default_rng(7)
        lut = np.frombuffer(B, dtype=np.uint8)
        with open(path + ".part", "wb") as f:
            qual = b"I" * 150
            n_reads = 100_000_000 // 150
            chunk = 10_000
            for base in range(0, n_reads, chunk):
                m = min(chunk, n_reads - base)
                seqs = lut[srng.integers(0, 4, size=(m, 150))]
                rows = []
                for i in range(m):
                    rows.append(b"@sr%d\n" % (base + i))
                    rows.append(seqs[i].tobytes())
                    rows.append(b"\n+\n")
                    rows.append(qual)
                    rows.append(b"\n")
                f.write(b"".join(rows))
        os.replace(path + ".part", path)
        print("steady fixture done:", path)
    else:
        print("steady fixture exists:", path)
    sys.exit(0)

# big.fasta: ~9 Mb, multi-record, N runs, multi-line, mixed case
with open("/tmp/vfy/big.fasta", "wb") as f:
    total = 0
    rid = 0
    while total < 9_000_000:
        n = int(rng.integers(5_000, 400_000))
        s = bytearray(rand_seq(n, rng))
        # sprinkle N runs
        for _ in range(max(1, n // 50_000)):
            p = int(rng.integers(0, max(1, n - 30)))
            L = int(rng.integers(1, 25))
            s[p : p + L] = b"N" * L
        # lowercase a stretch
        p = int(rng.integers(0, max(1, n // 2)))
        s[p : p + 500] = bytes(s[p : p + 500]).lower()
        f.write(b">rec%d desc\n" % rid)
        sb = bytes(s)
        for i in range(0, len(sb), 70):
            f.write(sb[i : i + 70] + b"\n")
        total += n
        rid += 1
with open("/tmp/vfy/big.fasta", "rb") as f:
    data = f.read()
with gzip.open("/tmp/vfy/big.fasta.gz", "wb") as f:
    f.write(data)

with open("/tmp/vfy/tedge.fasta", "wb") as f:
    f.write(b">t\n" + b"T" * 40 + b"\n")

# two small genomes for build/compare/query/classify
ga = rand_seq(200_000, rng)
gb = bytearray(ga)
# mutate ~2% of gb
idx = rng.random(len(gb)) < 0.02
for i in np.flatnonzero(idx):
    gb[i] = B[int(rng.integers(0, 4))]
gb = bytes(gb)
with open("/tmp/vfy/a.fasta", "wb") as f:
    f.write(b">ga\n" + ga + b"\n")
with open("/tmp/vfy/b.fasta", "wb") as f:
    f.write(b">gb\n" + gb + b"\n")

# reads: half from ga, half random, FASTQ
with open("/tmp/vfy/reads.fastq", "wb") as f:
    for i in range(2000):
        if i % 2 == 0:
            p = int(rng.integers(0, len(ga) - 150))
            r = ga[p : p + 150]
        else:
            r = rand_seq(150, rng)
        f.write(b"@r%d\n" % i + r + b"\n+\n" + b"I" * 150 + b"\n")
print("fixtures done")
