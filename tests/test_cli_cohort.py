"""cohort CLI drivers (VERDICT round 1 #9): offline via injected fakes.

Parity target: entrez-tool/entrez_query.py:540-837 (mode dispatch,
config merge, validate output, hybrid-only loop) exercised through the
`orion-kmer-tpu cohort ...` subcommands.
"""

import json
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from orion_kmer_tpu.cohort.entrez import EntrezQueryTool

from .util import run_cli, write_file


class FakeEutils:
    """Minimal eutils simulator: url -> canned JSON, with a request log."""

    def __init__(self):
        self.requests = []
        self.sra_uids = ["101", "102"]
        self.valid_accessions = {"SRR12345678", "PRJNA12345"}

    def __call__(self, url: str) -> str:
        self.requests.append(url)
        parts = urlparse(url)
        params = {k: unquote(v[0]) for k, v in parse_qs(parts.query).items()}
        endpoint = parts.path.rsplit("/", 1)[-1]
        db = params.get("db")
        if endpoint == "esearch.fcgi" and db == "sra":
            term = params.get("term", "")
            if "[Accession]" in term:
                acc = term.split("[")[0]
                n = "1" if acc in self.valid_accessions else "0"
                return json.dumps({"esearchresult": {"count": n, "idlist": []}})
            return json.dumps(
                {
                    "esearchresult": {
                        "count": str(len(self.sra_uids)),
                        "idlist": self.sra_uids,
                    }
                }
            )
        if endpoint == "esearch.fcgi" and db in ("biosample", "bioproject"):
            term = params.get("term", "")
            if "[Accession]" in term:
                acc = term.split("[")[0]
                n = "1" if acc in self.valid_accessions else "0"
                return json.dumps({"esearchresult": {"count": n, "idlist": []}})
            return json.dumps({"esearchresult": {"count": "1", "idlist": ["777"]}})
        if endpoint == "esummary.fcgi" and db == "sra":
            result = {"uids": self.sra_uids}
            for i, uid in enumerate(self.sra_uids):
                result[uid] = {"runs": f'acc="SRR0000{i}" total_spots="1"'}
            return json.dumps({"result": result})
        if endpoint == "elink.fcgi":
            return json.dumps(
                {
                    "linksets": [
                        {"linksetdbs": [{"dbto": "sra", "links": ["101"]}]}
                    ]
                }
            )
        return json.dumps({})


class FakeMeta:
    def __init__(self, rows):
        self.rows = rows

    def sra_metadata(self, accessions, detailed=True):
        accs = set(accessions)
        return [
            r
            for r in self.rows
            if r.get("run_accession") in accs
            or r.get("sample_accession") in accs
            or detailed
        ]


@pytest.fixture
def fake_tool(monkeypatch):
    fake = FakeEutils()
    rows = [
        {
            "run_accession": "SRR00000",
            "sample_accession": "SAMN1",
            "instrument_model": "Illumina MiSeq",
        },
        {
            "run_accession": "SRR00001",
            "sample_accession": "SAMN1",
            "instrument_model": "MinION",
        },
    ]

    def make_tool(email, api_key):
        return EntrezQueryTool(
            email=email,
            api_key=api_key,
            transport=fake,
            metadata_client=FakeMeta(rows),
            sleep=lambda s: None,
        )

    import orion_kmer_tpu.commands.cohort as cohort_cmd

    monkeypatch.setattr(cohort_cmd, "make_tool", make_tool)
    return fake


def test_cohort_validate(fake_tool, capsys):
    rc = run_cli("cohort", "validate", "SRR12345678", "SAMN99999999")
    assert rc == 0
    out = capsys.readouterr().out
    assert "SRR12345678: VALID" in out
    assert "SAMN99999999: INVALID" in out
    # strict mode exits nonzero on any invalid
    rc = run_cli("cohort", "validate", "--strict", "SAMN99999999")
    assert rc == 1


def test_cohort_search_sra_with_config_merge(fake_tool, tmp_path, capsys):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("environment: blood\nhost: Homo sapiens\n")
    out = tmp_path / "res.json"
    rc = run_cli(
        "cohort", "search", "--sra", "-c", cfg, "-k", "Klebsiella", "-o", out,
    )
    assert rc == 0
    # config contributed environment+host; CLI contributed keywords
    search_urls = [u for u in fake_tool.requests if "esearch" in u and "db=sra" in u]
    assert search_urls
    term = unquote(search_urls[0])
    assert '"blood"' in term
    assert '"Homo sapiens"[Organism]' in term
    assert '"Klebsiella"' in term
    results = json.loads(out.read_text())
    assert {r["run_accession"] for r in results} == {"SRR00000", "SRR00001"}


def test_cohort_search_hybrid_only(fake_tool, tmp_path):
    out = tmp_path / "hy.json"
    rc = run_cli(
        "cohort", "search", "--hybrid-only", "-k", "metagenome", "-m", "5",
        "-o", out,
    )
    assert rc == 0
    results = json.loads(out.read_text())
    # SAMN1 has Illumina + MinION rows -> hybrid
    assert any(r["sample_accession"] == "SAMN1" for r in results)
    # hybrid mode searches long reads only (ref:646-651)
    term = unquote(next(u for u in fake_tool.requests if "esearch" in u))
    assert "oxford nanopore" in term and "illumina%22%5BPlatform" not in term


def test_cohort_search_from_bioproject(fake_tool, tmp_path):
    out = tmp_path / "bp.json"
    rc = run_cli("cohort", "search", "--from-bioproject", "PRJNA12345", "-o", out)
    assert rc == 0
    results = json.loads(out.read_text())
    assert results  # fetched details of the linked runs


def test_cohort_hybrid_pipeline(tmp_path, monkeypatch):
    import gzip

    import orion_kmer_tpu.commands.cohort as cohort_cmd

    rows = [
        {
            "study_accession": "PRJ1",
            "sample_accession": "S1",
            "run_accession": "R1",
            "instrument_model": "Illumina MiSeq",
        },
        {
            "study_accession": "PRJ1",
            "sample_accession": "S1",
            "run_accession": "R2",
            "instrument_model": "MinION",
        },
    ]

    class Client:
        def sra_metadata(self, accessions, detailed=True):
            return rows

    monkeypatch.setattr(cohort_cmd, "make_client", lambda: Client())
    manifest = tmp_path / "runs.json.gz"
    manifest.write_bytes(gzip.compress(json.dumps(rows).encode()))
    out = tmp_path / "hybrid.json"
    rc = run_cli("cohort", "hybrid", "-i", manifest, "-o", out)
    assert rc == 0
    hybrids = json.loads(out.read_text())
    assert [h["biosample"] for h in hybrids] == ["S1"]


def test_cohort_summarize(tmp_path, monkeypatch):
    import orion_kmer_tpu.commands.cohort as cohort_cmd

    class Client:
        def sra_metadata(self, accessions, detailed=True):
            return [
                {
                    "biosample": "S1",
                    "instrument_model": "Illumina MiSeq",
                    "organism_name": "human blood metagenome",
                }
            ]

    monkeypatch.setattr(cohort_cmd, "make_client", lambda: Client())
    inp = tmp_path / "hybrid.json"
    inp.write_text(json.dumps([{"biosample": "S1"}]))
    out = tmp_path / "summary.tsv"
    rc = run_cli("cohort", "summarize", "-i", inp, "-o", out)
    assert rc == 0
    lines = out.read_text().splitlines()
    assert len(lines) >= 2 and "S1" in lines[1]
