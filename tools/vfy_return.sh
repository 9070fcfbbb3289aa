# Tunnel-return runbook (round 5): run EVERYTHING queued on TPU access,
# in priority order, one TPU client at a time.  Run from /root/repo:
#   bash tools/vfy_return.sh 2>&1 | tee /tmp/vfy_return.log
#
# Order rationale:
#   1. CLI matrix + oracle check first (correctness at HEAD gates all
#      numbers; also warms the XLA-merge program set).
#   2. bench.py (headline numbers at HEAD, best-of-3 + spread fields --
#      VERDICT r4 item 1a; warms the Pallas set).
#   3. vfy_bench_ab.py (VERDICT r4 items 1b/1c: query BATCHxDB A/B, RTT
#      probe, strict k31/k21 sustained interleave).
#   4. probe_radix.py (VERDICT r4 item 2: per-pass floor for the
#      roofline-or-radix decision).
#   5. vfy_cohort_serve.py (VERDICT r4 item 4: config-4 cohort at scale
#      through ONE resident serve process, serve-vs-fresh speedup,
#      failure isolation at 50 samples).
set -x
cd /root/repo

[ -s /tmp/vfy/big.fasta ] || python tools/vfy_gen.py || exit 1

timeout 300 python tools/vfy_probe.py || { echo "TUNNEL DOWN"; exit 1; }

bash tools/vfy_drive.sh 2>&1 | tee /tmp/vfy_drive.log
timeout 900 python tools/vfy_check_all.py | tee /tmp/vfy_check.log
grep -q "ALL CHECKS PASSED" /tmp/vfy_check.log || { echo "ORACLE CHECK FAILED"; exit 1; }

timeout 5400 python bench.py | tee /tmp/bench_head.json

timeout 3600 python tools/vfy_bench_ab.py 2>&1 | tee /tmp/vfy_bench_ab.log

timeout 1800 python tools/probe_radix.py 2>&1 | tee /tmp/probe_radix.log

timeout 7200 python tools/vfy_cohort_serve.py 2>&1 | tee /tmp/vfy_cohort.log

echo RETURN-RUNBOOK-DONE
