"""Stage checkpointing, resume, and per-partition lineage metrics
(SURVEY.md §7.2 stage 8; north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

Every pipeline stage writes to its own table; a ``_metrics`` sidecar
records per-partition row counts and wall time, and a ``_committed``
marker makes the write atomic-observable.  Restart = anti-join the
committed keys.

The PHYSICAL table layer is pluggable (:class:`ParquetFormat` /
:class:`IcebergFormat`, ``--table-format`` on the pipeline job).  The
default writes bare parquet directories under ``out_dir``.  On an
Iceberg deployment the same stages go through
``df.writeTo(catalog.ns.stage)`` / ``spark.read.table(...)`` — writes
are snapshot-atomic in the catalog — and the ``_committed_<stage>``
marker CONTENT becomes the committed snapshot id, so "resumes from the
last committed Iceberg snapshot checkpoint" (BASELINE.json north_star)
is literally the marker contract: the control flow (markers, params
sidecars, ``_delta_pending`` crash recovery) is identical across
formats, only the bytes under the table ident change.

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


class ParquetFormat:
    """Default physical layer: one parquet directory per stage under
    ``out_dir``.  ``commit_ref`` has no catalog snapshot to point at,
    so the marker carries the write timestamp (pre-round-5 behavior,
    byte-compatible with existing KBs)."""

    name = "parquet"

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def write(
        self,
        df: DataFrame,
        stage: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> str | None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.out_dir, stage))
        return None

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, stage))


class IcebergFormat:
    """Iceberg physical layer: stages are tables
    ``<table_prefix>.<stage>`` in a configured Spark catalog; every
    write commits a snapshot and :func:`write_stage` records that
    snapshot id in the ``_committed_<stage>`` marker.

    Requires the Iceberg Spark runtime on the classpath and a catalog
    conf, e.g.::

        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
          --conf spark.sql.catalog.kb=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.kb.type=hadoop \\
          --conf spark.sql.catalog.kb.warehouse=/data/warehouse \\
          jobs/run_kg_pipeline.py --table-format iceberg --table-prefix kb.crawl ...

    Fails fast at construction when the catalog is not configured (the
    sandbox ships no Iceberg jar — ``tests/test_runtime.py`` pins the
    error message and skips the live path when the jar is absent)."""

    name = "iceberg"

    def __init__(self, spark: SparkSession, table_prefix: str):
        catalog = table_prefix.split(".", 1)[0]
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if not impl:
            raise RuntimeError(
                f"--table-format iceberg needs a configured Spark "
                f"catalog: set spark.sql.catalog.{catalog} (e.g. "
                "org.apache.iceberg.spark.SparkCatalog) plus its "
                "type/warehouse confs, and ship the "
                "iceberg-spark-runtime jar via --packages"
            )
        self.table_prefix = table_prefix

    def _ident(self, stage: str) -> str:
        return f"{self.table_prefix}.{stage}"

    def write(
        self,
        df: DataFrame,
        stage: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> str | None:
        ident = self._ident(stage)
        spark = df.sparkSession
        w = df.writeTo(ident)
        if mode == "append" and spark.catalog.tableExists(ident):
            w.append()
        else:
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        # The table's CURRENT snapshot (the `main` branch head in the
        # `refs` metadata table), not `snapshots ORDER BY committed_at`:
        # committed_at has millisecond granularity, so a timestamp sort
        # is ambiguous even in the single-writer case.  Each stage
        # table has ONE writer (this job) by design, so the branch head
        # read here IS this write's commit; under an out-of-contract
        # concurrent writer the head could advance between commit and
        # read — a far narrower window than the timestamp sort, and
        # "the last committed snapshot checkpoint" (the resume
        # contract) is still what the marker records.
        row = spark.sql(
            f"SELECT snapshot_id FROM {ident}.refs WHERE name = 'main'"
        ).first()
        return f"snapshot={row[0]}" if row else None

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.table(self._ident(stage))


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: ParquetFormat | IcebergFormat | None = None,
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
    fmt = fmt or ParquetFormat(out_dir)
    t0 = time.time()
    commit_ref = fmt.write(df, stage, mode=mode, partition_by=partition_by)
    wall = time.time() - t0

    counted = (
        df if mode == "append" else fmt.read(df.sparkSession, stage)
    )
    per_part = (
        counted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    metrics = {
        "stage": stage,
        "mode": mode,
        "format": fmt.name,
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
        # parquet: commit wall time; iceberg: the committed snapshot id
        # — the marker IS the "last committed snapshot checkpoint"
        f.write(commit_ref or str(int(time.time())))
    return metrics


def is_committed(out_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(out_dir, f"_committed_{stage}"))


def read_stage(
    spark: SparkSession, out_dir: str, stage: str,
    fmt: ParquetFormat | IcebergFormat | None = None,
) -> DataFrame:
    return (fmt or ParquetFormat(out_dir)).read(spark, stage)


def resume_delta(
    inputs: DataFrame, spark: SparkSession, out_dir: str, stage: str,
    key: str = "url",
    fmt: ParquetFormat | IcebergFormat | None = None,
) -> DataFrame:
    """Rows of ``inputs`` not yet present in the committed stage output
    — the restart anti-join (left_anti keeps the big side map-local
    when the committed key set is broadcastable; at scale this is a
    shuffled anti-join on the key, which is exactly what we want)."""
    if not is_committed(out_dir, stage):
        return inputs
    done = read_stage(spark, out_dir, stage, fmt=fmt).select(key).distinct()
    return inputs.join(done, on=key, how="left_anti")


def run_metrics(out_dir: str) -> list[dict]:
    out = []
    for fn in sorted(os.listdir(out_dir)):
        if fn.startswith("_metrics_") and fn.endswith(".json"):
            with open(os.path.join(out_dir, fn)) as f:
                out.append(json.load(f))
    return out
