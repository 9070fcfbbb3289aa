# Sequential steady-state investigation (VERDICT r2 #3), one TPU client
# at a time.  Run from /root/repo:  bash tools/vfy_steady_drive.sh
# Logs land in /tmp/prof_{a,b,c,d}.log.
set -x
cd /root/repo
F=/tmp/vfy/ecoli100m.fastq

# regenerate the fixture if /tmp was wiped (host-only, no jax)
[ -s "$F" ] || python tools/vfy_gen.py --steady || { echo "FIXTURE GEN FAILED"; exit 1; }

# tunnel must be healthy first
timeout 300 python tools/vfy_probe.py || { echo "TUNNEL DOWN"; exit 1; }

# (a) baseline: 4M batches, serial staging
timeout 2400 python -u tools/prof_steady.py $F 31 22 5 > /tmp/prof_a.log 2>&1
echo "a rc=$?"; tail -16 /tmp/prof_a.log

# (b) threaded transfer staging, 4M batches
ORION_KMER_STAGE_THREADS=4 timeout 1800 python -u tools/prof_steady.py $F 31 22 5 > /tmp/prof_b.log 2>&1
echo "b rc=$?"; tail -16 /tmp/prof_b.log

# (c) 16M batches (new sort@16M program: first run pays ~1-3 min compile)
timeout 2400 python -u tools/prof_steady.py $F 31 24 3 > /tmp/prof_c.log 2>&1
echo "c rc=$?"; tail -16 /tmp/prof_c.log

# (d) 16M batches + threaded staging
ORION_KMER_STAGE_THREADS=4 timeout 1800 python -u tools/prof_steady.py $F 31 24 3 > /tmp/prof_d.log 2>&1
echo "d rc=$?"; tail -16 /tmp/prof_d.log

echo STEADY-DRIVE-DONE
