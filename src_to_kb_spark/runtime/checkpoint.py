"""Stage checkpointing, resume, and per-partition lineage metrics
(SURVEY.md §7.2 stage 8; north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

Every pipeline stage writes to its own table directory; a ``_metrics``
sidecar records per-partition row counts and wall time, and a
``_committed`` marker makes the write atomic-observable.  Restart =
anti-join the committed keys (here; on a real cluster the same role is
played by the last committed Iceberg snapshot).

The reference analog is the run-stats object + summary sink
(kb-generator.js:36-41, :487-509) and the API's background-generation
status map (api-server.js:259-296) — re-expressed as durable,
partition-grained artifacts instead of in-process state.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict:
    """Write a stage output + per-partition lineage metrics.

    Returns the metrics dict: {stage, wall_sec, n_rows, partitions:
    [{partition_id, n_rows}, ...]}.

    ``mode='overwrite'`` reads the WRITTEN table back for the counts —
    O(what was just written).  ``mode='append'`` (the resume path's
    delta writes) counts the DELTA DataFrame instead: re-reading the
    whole table would cost an O(corpus) scan per per-document delta
    append, turning the documented O(delta) resume into O(corpus) —
    the sidecar then describes THIS write (``"mode": "append"``), i.e.
    the lineage of the increment, not the cumulative table.
    """
    path = os.path.join(out_dir, stage)
    t0 = time.time()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    wall = time.time() - t0

    counted = (
        df if mode == "append" else df.sparkSession.read.parquet(path)
    )
    per_part = (
        counted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    metrics = {
        "stage": stage,
        "mode": mode,
        "wall_sec": round(wall, 3),
        "n_rows": int(sum(r["n_rows"] for r in per_part)),
        "partitions": sorted(
            ({"partition_id": r["partition_id"], "n_rows": r["n_rows"]}
             for r in per_part),
            key=lambda d: d["partition_id"],
        ),
    }
    with open(os.path.join(out_dir, f"_metrics_{stage}.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    with open(os.path.join(out_dir, f"_committed_{stage}"), "w") as f:
        f.write(str(int(time.time())))
    return metrics


def is_committed(out_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(out_dir, f"_committed_{stage}"))


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, stage))


def resume_delta(
    inputs: DataFrame, spark: SparkSession, out_dir: str, stage: str,
    key: str = "url",
) -> DataFrame:
    """Rows of ``inputs`` not yet present in the committed stage output
    — the restart anti-join (left_anti keeps the big side map-local
    when the committed key set is broadcastable; at scale this is a
    shuffled anti-join on the key, which is exactly what we want)."""
    if not is_committed(out_dir, stage):
        return inputs
    done = read_stage(spark, out_dir, stage).select(key).distinct()
    return inputs.join(done, on=key, how="left_anti")


def run_metrics(out_dir: str) -> list[dict]:
    out = []
    for fn in sorted(os.listdir(out_dir)):
        if fn.startswith("_metrics_") and fn.endswith(".json"):
            with open(os.path.join(out_dir, fn)) as f:
                out.append(json.load(f))
    return out
