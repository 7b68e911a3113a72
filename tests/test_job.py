"""spark-submit job driver: stage commits, lineage metrics, resume.

The CLI surface itself (`spark-submit --py-files dist/... jobs/...`)
is exercised manually / by the driver; here the job's main() runs
in-process against the session fixture, twice, to pin the resume
semantics.
"""

from __future__ import annotations

import json
import os

from jobs.run_kg_pipeline import main

from .conftest import SF_SMOKE


def test_job_runs_and_resumes(spark, tmp_path):
    out = str(tmp_path / "kb")
    s1 = main(["--input", SF_SMOKE, "--output", out])
    assert s1["triples"] > 0
    assert s1["documents"] == 500
    for stage in ["documents", "chunks", "linked", "neardup_pairs",
                  "components", "triples"]:
        assert os.path.exists(os.path.join(out, f"_committed_{stage}"))
        m = json.load(open(os.path.join(out, f"_metrics_{stage}.json")))
        assert m["n_rows"] == sum(p["n_rows"] for p in m["partitions"])

    # full resume: nothing recomputed, same outputs re-read
    mtime = os.path.getmtime(os.path.join(out, "_committed_triples"))
    s2 = main(["--input", SF_SMOKE, "--output", out])
    assert s2["triples"] == s1["triples"]
    assert os.path.getmtime(os.path.join(out, "_committed_triples")) == mtime

    # partial resume: drop one stage marker -> only that stage recomputed
    os.remove(os.path.join(out, "_committed_triples"))
    s3 = main(["--input", SF_SMOKE, "--output", out])
    assert s3["triples"] == s1["triples"]


def _triple_set(spark, out):
    return {
        (r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(os.path.join(out, "triples"))
        .select("subj", "pred", "obj").collect()
    }


def test_job_resume_propagates_input_delta(spark, tmp_path):
    """Growing the input after a committed run must NOT serve stale
    downstream tables: per-doc stages delta-append, global stages
    (neardup/components/triples) recompute (ADVICE r1)."""
    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    inp = str(tmp_path / "in")
    src.filter("doc_id < 300").write.parquet(f"{inp}/documents.parquet")
    out = str(tmp_path / "kb")
    s1 = main(["--input", inp, "--output", out])
    assert s1["documents"] == 300

    src.write.mode("overwrite").parquet(f"{inp}/documents.parquet")
    s2 = main(["--input", inp, "--output", out])
    assert s2["documents"] == 500

    out_full = str(tmp_path / "kb_full")
    s3 = main(["--input", inp, "--output", out_full])
    assert s2["triples"] == s3["triples"]
    assert s2["chunks"] == s3["chunks"]
    assert _triple_set(spark, out) == _triple_set(spark, out_full)


def test_job_dedupes_input_urls(spark, tmp_path):
    """A crawl revisiting pages (duplicate urls) must not duplicate
    triples — the job enforces url uniqueness at ingest."""
    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    inp = str(tmp_path / "in_dup")
    src.union(src.limit(50)).write.parquet(f"{inp}/documents.parquet")
    out = str(tmp_path / "kb_dup")
    s = main(["--input", inp, "--output", out])
    assert s["documents"] == 500
    out_ref = str(tmp_path / "kb_ref")
    inp2 = str(tmp_path / "in_ref")
    src.write.parquet(f"{inp2}/documents.parquet")
    s_ref = main(["--input", inp2, "--output", out_ref])
    assert s["triples"] == s_ref["triples"]
    assert _triple_set(spark, out) == _triple_set(spark, out_ref)
