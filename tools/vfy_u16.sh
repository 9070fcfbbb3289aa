# On-chip validation + microbench for the u16-b-plane merge forest
# (ops/merge_mixed.py, ORION_KMER_U16_FOREST).  Run from /root/repo:
#   bash tools/vfy_u16.sh
# ONE TPU client at a time; every step under timeout.
#
# Success criteria (CLAUDE.md backlog #1):
#   1. u16-CORRECT: k=21 CLI count with the flag is byte-identical to
#      the default path over the 9 Mb fixture (which is itself
#      oracle-verified by tools/vfy_check_all.py).
#   2. bench with the flag: sustained_k21_kmers_per_s materially above
#      the 207.8M/s of the widened path (expect ~+8-10%).
# If step 1 fails or wedges, the Mosaic u16 CE/DMA path is bad: keep the
# flag default off and record the negative result in CLAUDE.md.
set -x
cd /root/repo

[ -s /tmp/vfy/big.fasta ] || python tools/vfy_gen.py || exit 1
timeout 150 python tools/vfy_probe.py || { echo "TUNNEL DOWN"; exit 1; }

# reference output (warm path, Pallas widened forest)
timeout 1800 python -m orion_kmer_tpu count -k 21 -i /tmp/vfy/big.fasta -o /tmp/vfy/u16_ref.tsv
echo "ref rc=$?"

# flagged run: first-ever Mosaic u16 programs -> compile storm expected
# (one program per (bucket, depth) merge + the n16 sort; budget ~15 min)
ORION_KMER_U16_FOREST=1 timeout 2400 python -m orion_kmer_tpu count -k 21 -i /tmp/vfy/big.fasta -o /tmp/vfy/u16_got.tsv
echo "flag rc=$?"
cmp /tmp/vfy/u16_ref.tsv /tmp/vfy/u16_got.tsv && echo U16-CORRECT

# microbench (warm cache from the run above; bench compiles its own
# shapes -- first flagged bench pays those compiles once)
timeout 3600 python bench.py > /tmp/vfy/bench_u32.json
echo "bench u32 rc=$?"; cat /tmp/vfy/bench_u32.json
ORION_KMER_U16_FOREST=1 timeout 3600 python bench.py > /tmp/vfy/bench_u16.json
echo "bench u16 rc=$?"; cat /tmp/vfy/bench_u16.json
echo U16-DRIVE-DONE
