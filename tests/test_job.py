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
