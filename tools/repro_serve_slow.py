"""Reproduce the in-serve profile slowness on CPU (round-5 debug)."""
import faulthandler, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["ORION_KMER_BATCH"] = str(1 << 20)
os.environ["ORION_KMER_PALLAS_SORT"] = "0"

faulthandler.dump_traceback_later(90, repeat=True)

from orion_kmer_tpu.engine import DeviceCountTable, _make_count_table
t0 = time.perf_counter()
table = _make_count_table(31)
if isinstance(table, DeviceCountTable):
    table.warm()
print(f"warm: {time.perf_counter()-t0:.1f}s", flush=True)

from orion_kmer_tpu.server import run_request
DIR = "/tmp/vfy_cohort_small"
# single-sample manifest
man = os.path.join(DIR, "man1.json")
with open(os.path.join(DIR, "manifest.json")) as f:
    entries = json.load(f)
ok = [e for e in entries if os.path.exists(e["files"][0])][:1]
with open(man, "w") as f:
    json.dump(ok, f)
t0 = time.perf_counter()
rep = run_request(["profile", "-k", "31", "--manifest", man,
                   "-d", os.path.join(DIR, "cohort.db"),
                   "--scaled", "1000", "--min-coverage", "0.05",
                   "-o", os.path.join(DIR, "p1.json")])
print(f"profile 1 sample in-process: {time.perf_counter()-t0:.1f}s rc={rep['rc']}", flush=True)
if rep["rc"] != 0:
    print(rep["stderr"][-2000:])
