"""End-to-end drive of the serve surface with REAL subprocesses.

Starts `python -m orion_kmer_tpu serve` as its own process, forwards a
count + an error probe + shutdown through the `--server` client flag,
and byte-compares the served count against a direct (no-server) run of
the same CLI in another subprocess.

    python tools/vfy_serve.py          # CPU backend (safe during TPU runs)
    python tools/vfy_serve.py --tpu    # on the chip -- ONE TPU client at a
                                       # time: the server IS the client;
                                       # never run this while another TPU
                                       # process is live

CPU forcing on this machine needs jax.config.update after import
(CLAUDE.md), which the CLI doesn't expose; the subprocesses get it via a
sitecustomize shim on PYTHONPATH.
"""

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    tpu = "--tpu" in sys.argv
    tmp = tempfile.mkdtemp(prefix="okt_serve_")
    env = dict(os.environ)
    if not tpu:
        # force-CPU shim: env JAX_PLATFORMS=cpu alone is overridden by the
        # axon sitecustomize, so prepend our own sitecustomize that does
        # the config call the moment jax is imported.
        shim = os.path.join(tmp, "shim")
        os.makedirs(shim)
        with open(os.path.join(shim, "sitecustomize.py"), "w") as f:
            f.write(
                "import importlib.util\n"
                "if importlib.util.find_spec('jax'):\n"
                "    import jax\n"
                "    jax.config.update('jax_platforms', 'cpu')\n"
            )
        env["PYTHONPATH"] = shim + os.pathsep + env.get("PYTHONPATH", "")
    k = "7"
    fa = os.path.join(tmp, "s.fasta")
    with open(fa, "w") as f:
        f.write(">s1\nACGTACGTACGTTTTTCCCCGGGGAAAA\n>s2\nGATTACAGATTACANNNACGT\n")
    if tpu and os.path.exists("/tmp/vfy/big.fasta"):
        # the 9 Mb fixture crosses the real batch/merge-forest programs,
        # so the request-2-vs-request-1 delta shows the executable-load
        # ladder the resident server amortizes
        fa, k = "/tmp/vfy/big.fasta", "31"
    sock = os.path.join(tmp, "okt.sock")
    direct, served = os.path.join(tmp, "direct.tsv"), os.path.join(tmp, "served.tsv")

    cli = [sys.executable, "-m", "orion_kmer_tpu"]

    def run(*a, **kw):
        t0 = time.monotonic()
        p = subprocess.run([*cli, *a], cwd=REPO, env=env, timeout=3600, **kw)
        print(f"[vfy_serve] {a[0]} {a[-1]}: {time.monotonic() - t0:.1f} s", flush=True)
        return p

    rc = run("count", "-k", k, "-i", fa, "-o", direct).returncode
    assert rc == 0, f"direct count rc={rc}"

    srv = subprocess.Popen([*cli, "serve", "--socket", sock], cwd=REPO, env=env)
    try:
        for _ in range(600):
            if os.path.exists(sock):
                break
            time.sleep(0.5)
        assert os.path.exists(sock), "server socket never appeared"

        rc = run("--server", sock, "count", "-k", k, "-i", fa, "-o", served).returncode
        assert rc == 0, f"served count rc={rc}"
        with open(direct, "rb") as f1, open(served, "rb") as f2:
            assert f1.read() == f2.read(), "served != direct output"
        print("SERVED-COUNT-IDENTICAL")

        served2 = os.path.join(tmp, "served2.tsv")
        rc = run("--server", sock, "count", "-k", k, "-i", fa, "-o", served2).returncode
        assert rc == 0, f"served count 2 rc={rc}"
        with open(direct, "rb") as f1, open(served2, "rb") as f2:
            assert f1.read() == f2.read(), "served2 != direct output"
        print("SERVED-REPEAT-IDENTICAL")

        p = run("--server", sock, "count", "-k", k, "-i", "/nope", "-o", "/tmp/x",
                capture_output=True)
        assert p.returncode == 1 and b"[ERROR orion_kmer_tpu]" in p.stderr, (
            p.returncode, p.stderr)
        print("SERVED-ERROR-RC-OK")

        rc = run("--server", sock, "shutdown").returncode
        assert rc == 0, f"shutdown rc={rc}"
        srv.wait(timeout=60)
        assert srv.returncode == 0, f"server exit rc={srv.returncode}"
        print("SERVE-VERIFY-PASSED")
        return 0
    finally:
        if srv.poll() is None:
            srv.kill()


if __name__ == "__main__":
    sys.exit(main())
