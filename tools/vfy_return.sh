# Tunnel-return runbook: run EVERYTHING queued on TPU access, in priority
# order, one TPU client at a time.  Run from /root/repo:
#   bash tools/vfy_return.sh 2>&1 | tee /tmp/vfy_return.log
#
# Order rationale:
#   1. CLI matrix + oracle check first (correctness at HEAD gates all
#      numbers; also warms the XLA-merge program set).
#   2. bench.py (headline numbers at HEAD; warms the Pallas set).
#   3. Steady-state A/B (VERDICT r2 #3) -- needs a healthy tunnel for
#      ~2 h of driving.
#   4. u16-forest validation (flag flip decision) last: it compiles a
#      NEW Mosaic program set; failures there must not block 1-3.
set -x
cd /root/repo

[ -s /tmp/vfy/big.fasta ] || python tools/vfy_gen.py || exit 1

timeout 300 python tools/vfy_probe.py || { echo "TUNNEL DOWN"; exit 1; }

bash tools/vfy_drive.sh 2>&1 | tee /tmp/vfy_drive.log
timeout 900 python tools/vfy_check_all.py | tee /tmp/vfy_check.log
grep -q "ALL CHECKS PASSED" /tmp/vfy_check.log || { echo "ORACLE CHECK FAILED"; exit 1; }

timeout 3600 python bench.py | tee /tmp/bench_head.json

bash tools/vfy_steady_drive.sh 2>&1 | tee /tmp/vfy_steady.log


timeout 1800 python tools/bench_sort.py 2>&1 | tee /tmp/bench_sort.log

echo RETURN-RUNBOOK-DONE
