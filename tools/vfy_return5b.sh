# Round-5 return runbook, part B: the CLI matrix + oracle check already
# PASSED at this HEAD (PARITY.md round-5 row, commit 4157fcf) and no
# ops/engine source has changed since, so skip straight to the four
# remaining TPU items (VERDICT r4 items 1a/1b/1c, 2, 4).  Run from
# /root/repo, ONE TPU client at a time:
#   bash tools/vfy_return5b.sh 2>&1 | tee /tmp/vfy_return5b.log
set -x
cd /root/repo

[ -s /tmp/vfy/big.fasta ] || python tools/vfy_gen.py || exit 1

timeout 300 python tools/vfy_probe.py || { echo "TUNNEL DOWN"; exit 1; }

# 1. Headline bench at HEAD (best-of-3 + spread fields; also warms the
#    Pallas program set for the driver's end-of-round bench).
timeout 7200 python bench.py | tee /tmp/bench_head.json

# 2. Driver-bench anomaly A/B (query BATCHxDB, RTT probe, k31/k21
#    sustained interleave).
timeout 3600 python tools/vfy_bench_ab.py 2>&1 | tee /tmp/vfy_bench_ab.log

# 3. Radix per-pass floor (roofline-or-radix go/no-go number).
timeout 1800 python tools/probe_radix.py 2>&1 | tee /tmp/probe_radix.log

# 4. Config-4 cohort at scale through ONE resident serve process.
timeout 7200 python tools/vfy_cohort_serve.py 2>&1 | tee /tmp/vfy_cohort.log

echo RETURN-RUNBOOK-5B-DONE
