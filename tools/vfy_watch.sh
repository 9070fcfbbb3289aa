# Tunnel watcher: probe every ~12 min (ONE client at a time, per
# CLAUDE.md); the moment the tunnel answers, run the full return
# runbook (tools/vfy_return.sh).  Bounded at ~9 h of waiting.
#   bash tools/vfy_watch.sh 2>&1 | tee /tmp/vfy_watch.log
cd /root/repo
deadline=$(( $(date +%s) + 9*3600 ))
attempt=0
while [ "$(date +%s)" -lt "$deadline" ]; do
  attempt=$((attempt+1))
  echo "[watch] probe attempt $attempt at $(date -u +%H:%M:%S)"
  if timeout 300 python tools/vfy_probe.py; then
    echo "[watch] TUNNEL UP at $(date -u +%H:%M:%S) -- launching runbook"
    bash tools/vfy_return.sh 2>&1 | tee /tmp/vfy_return.log
    echo "[watch] runbook rc=$?"
    exit 0
  fi
  echo "[watch] tunnel still down; sleeping 720 s"
  sleep 720
done
echo "[watch] deadline reached without tunnel return"
exit 1
