"""Cohort tooling tests (offline, with injected fakes)."""

import gzip
import json

import pytest

from orion_kmer_tpu.cohort.entrez import EntrezQueryTool, accession_db
from orion_kmer_tpu.cohort.find_hybrid import (
    find_hybrid_in_rows,
    find_hybrid_samples,
    load_studies,
    process_batch,
)
from orion_kmer_tpu.cohort.manifest import cohort_stats, select_samples
from orion_kmer_tpu.cohort.platforms import classify_platform
from orion_kmer_tpu.cohort.summarize import summarize_hybrid, summarize_rows


class TestClassifyPlatform:
    # test_find_hybrid_samples.py:5-15 table
    def test_reference_table(self):
        assert classify_platform("Illumina MiSeq") == "SHORT"
        assert classify_platform("MinION") == "LONG"
        assert classify_platform("GridION") == "LONG"
        assert classify_platform("PacBio RS II") == "LONG"
        assert classify_platform("NextSeq 500") == "SHORT"
        assert classify_platform("DNBSEQ-T7") == "SHORT"
        assert classify_platform("Ion Torrent PGM") == "SHORT"
        assert classify_platform("Unknown") == "OTHER"
        assert classify_platform(None) == "OTHER"
        assert classify_platform(123) == "OTHER"


def _row(sample, run, model, study="PRJ1"):
    return {
        "sample_accession": sample,
        "run_accession": run,
        "instrument_model": model,
        "study_accession": study,
    }


class FakeClient:
    def __init__(self, rows, fail_times=0):
        self.rows = rows
        self.fail_times = fail_times
        self.calls = 0

    def sra_metadata(self, accessions, detailed=True):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient")
        return [r for r in self.rows]


class TestFindHybrid:
    ROWS = [
        _row("S1", "R1", "Illumina MiSeq"),
        _row("S1", "R2", "MinION"),
        _row("S2", "R3", "Illumina NovaSeq 6000"),
        _row("S3", "R4", "PacBio Sequel II"),
        _row("S3", "R5", "DNBSEQ-T7", study="PRJ2"),
    ]

    def test_hybrid_grouping(self):
        hybrid = find_hybrid_in_rows(self.ROWS)
        by_sample = {h["biosample"]: h for h in hybrid}
        assert set(by_sample) == {"S1", "S3"}  # S2 has only short reads
        assert by_sample["S1"]["short_reads"][0]["run_accession"] == "R1"
        assert by_sample["S1"]["long_reads"][0]["run_accession"] == "R2"
        assert by_sample["S3"]["study_accession"] == ["PRJ1", "PRJ2"]

    def test_process_batch_retries(self):
        client = FakeClient(self.ROWS, fail_times=2)
        sleeps = []
        out = process_batch(["PRJ1"], client, sleep=sleeps.append)
        assert len(out) == 2
        assert sleeps == [2, 4]  # linear backoff (ref:79)

    def test_process_batch_gives_up(self):
        client = FakeClient(self.ROWS, fail_times=5)
        out = process_batch(["PRJ1"], client, sleep=lambda s: None)
        assert out == []

    def test_end_to_end_with_checkpoint(self, tmp_path):
        studies = [{"study_accession": f"PRJ{i}"} for i in range(7)]
        inp = tmp_path / "data.json.gz"
        inp.write_bytes(gzip.compress(json.dumps(studies).encode()))
        outp = tmp_path / "hybrid.json"
        client = FakeClient(self.ROWS)
        result = find_hybrid_samples(
            input_file=inp, output_file=outp, client=client, batch_size=1, workers=2
        )
        assert outp.exists()
        saved = json.loads(outp.read_text())
        assert len(saved) == len(result)
        # 7 batches x 2 hybrid samples each (fake returns same rows per batch)
        assert len(result) == 14

    def test_load_studies_missing_file(self, tmp_path):
        assert load_studies(tmp_path / "nope.json.gz") == []


class TestSummarize:
    def test_summarize_rows(self):
        rows = [
            {
                "biosample": "B1",
                "organism_name": "human metagenome",
                "env_local_scale": None,
                "isolation_source": "gut",
                "instrument_model": "Illumina MiSeq",
            },
            {
                "biosample": "B1",
                "organism_name": None,
                "instrument_model": "MinION",
            },
        ]
        out = summarize_rows(rows)
        assert out == [
            {
                "BioSample ID": "B1",
                "Sample Type": "human metagenome",
                "Environment": "gut",
                "Instruments": "Illumina MiSeq, MinION",
            }
        ]

    def test_invalid_env_values_skipped(self):
        rows = [
            {"biosample": "B1", "env_local_scale": "missing", "sample_name": "soil-7"}
        ]
        assert summarize_rows(rows)[0]["Environment"] == "soil-7"

    def test_end_to_end(self, tmp_path):
        hyb = [{"biosample": "B1"}, {"biosample": "B2"}]
        inp = tmp_path / "hyb.json"
        inp.write_text(json.dumps(hyb))
        outp = tmp_path / "summary.tsv"
        rows = [
            {"biosample": "B1", "organism_name": "x", "instrument_model": "MinION"},
            {"biosample": "B2", "organism_name": "y", "instrument_model": "MiSeq"},
        ]
        res = summarize_hybrid(inp, outp, client=FakeClient(rows), sleep=lambda s: None)
        lines = outp.read_text().strip().splitlines()
        assert lines[0].split("\t") == [
            "BioSample ID",
            "Sample Type",
            "Environment",
            "Instruments",
        ]
        assert len(lines) == 3
        assert len(res) == 2


class FakeTransport:
    def __init__(self, responses):
        self.responses = responses  # substring -> payload
        self.urls = []

    def __call__(self, url):
        self.urls.append(url)
        for frag, payload in self.responses.items():
            if frag in url:
                return payload
        return None


class TestEntrez:
    def test_accession_db(self):
        assert accession_db("SRR12345") == "sra"
        assert accession_db("SAMN0001") == "biosample"
        assert accession_db("PRJEB999") == "bioproject"
        assert accession_db("XXX") is None

    def test_search_sra(self):
        t = FakeTransport(
            {"esearch.fcgi": json.dumps(
                {"esearchresult": {"idlist": ["1", "2"], "count": "42"}}
            )}
        )
        tool = EntrezQueryTool(transport=t, sleep=lambda s: None)
        uids, count = tool.search_sra("metagenome")
        assert uids == ["1", "2"] and count == 42

    def test_uid_to_accession_runs_and_expxml(self):
        t = FakeTransport(
            {"esummary.fcgi": json.dumps(
                {"result": {
                    "1": {"runs": '<Run acc="SRR100" total_spots="5"/>'},
                    "2": {"runs": "", "expxml": 'Experiment acc="ERX200"'},
                }}
            )}
        )
        tool = EntrezQueryTool(transport=t, sleep=lambda s: None)
        assert tool.get_accessions_from_uids(["1", "2"]) == ["ERX200", "SRR100"]

    def test_validate_accession(self):
        t = FakeTransport(
            {"esearch.fcgi": json.dumps({"esearchresult": {"count": "1"}})}
        )
        tool = EntrezQueryTool(transport=t, sleep=lambda s: None)
        ok, msg = tool.validate_accession("SRR1")
        assert ok and "SRA" in msg
        ok, msg = tool.validate_accession("BOGUS")
        assert not ok

    def test_build_query(self):
        q = EntrezQueryTool.build_sra_search_query(
            environment="gut", has_short_reads=True, has_long_reads=True
        )
        assert '"gut"' in q and "illumina" in q and "oxford nanopore" in q

    def test_hybrid_loop(self):
        # one page of 2 uids; S1 hybrid, S2 not
        search = json.dumps({"esearchresult": {"idlist": ["1", "2"], "count": "2"}})
        summary = json.dumps(
            {"result": {
                "1": {"runs": '<Run acc="SRR1"/>'},
                "2": {"runs": '<Run acc="SRR2"/>'},
            }}
        )

        class MC:
            def sra_metadata(self, accs, detailed=True):
                if detailed:
                    return [
                        {"sample_accession": "S1", "run_accession": "SRR1"},
                        {"sample_accession": "S2", "run_accession": "SRR2"},
                    ]
                if accs == ["S1"]:
                    return [
                        {"instrument_model": "Illumina MiSeq"},
                        {"instrument_model": "MinION"},
                    ]
                return [{"instrument_model": "Illumina MiSeq"}]

        t = FakeTransport({"esearch.fcgi": search, "esummary.fcgi": summary})
        tool = EntrezQueryTool(transport=t, metadata_client=MC(), sleep=lambda s: None)
        out = tool.find_hybrid_samples("q", max_results=5)
        assert [r["sample_accession"] for r in out] == ["S1"]


class TestManifest:
    RECORDS = [
        {"sample_id": "A", "study_accession": "P1", "instrument_platform": "OXFORD_NANOPORE",
         "read_count": 10, "base_count": 1000},
        {"sample_id": "A", "study_accession": "P1", "instrument_platform": "PACBIO_SMRT",
         "read_count": 5, "base_count": 500},
        {"sample_id": "B", "study_accession": "P2", "instrument_platform": "OXFORD_NANOPORE",
         "read_count": 1, "base_count": 50},
    ]

    def test_stats(self):
        s = cohort_stats(self.RECORDS)
        assert s.n_runs == 3 and s.n_studies == 2 and s.n_samples == 2
        assert s.total_reads == 16 and s.total_bases == 1550
        assert s.platforms == {"OXFORD_NANOPORE": 2, "PACBIO_SMRT": 1}

    def test_select(self):
        sel = select_samples(self.RECORDS, platform="OXFORD_NANOPORE", min_bases=100)
        assert set(sel) == {"A"}

    def test_reference_dataset_loads(self):
        # the actual bundled dataset (P4) parses and matches SURVEY numbers
        import pathlib

        path = pathlib.Path("/root/reference/data_metagenome.json.gz")
        if not path.exists():
            pytest.skip("reference dataset not mounted")
        from orion_kmer_tpu.cohort.manifest import load_run_records

        records = load_run_records(path)
        s = cohort_stats(records)
        assert s.n_runs == 195922
        assert s.n_studies == 4101


def test_get_num_threads():
    import os

    from orion_kmer_tpu.utils import get_num_threads

    assert get_num_threads(4) == 4
    assert get_num_threads(0) == (os.cpu_count() or 1)
