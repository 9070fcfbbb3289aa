# Continuation of tools/vfy_return.sh after the matrix + oracle check
# have already passed (used round 4 when a drive-script arg bug aborted
# the runbook between steps).  Same order, same logs.
set -x
cd /root/repo
timeout 300 python tools/vfy_probe.py || { echo "TUNNEL DOWN"; exit 1; }
timeout 3600 python bench.py 2>/tmp/bench_head.err | tee /tmp/bench_head.json
bash tools/vfy_steady_drive.sh 2>&1 | tee /tmp/vfy_steady.log
timeout 1800 python tools/bench_sort.py 2>&1 | tee /tmp/bench_sort.log
echo RESUME-RUNBOOK-DONE
