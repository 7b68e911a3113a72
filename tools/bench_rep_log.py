#!/usr/bin/env python
"""Replicate bench.py's sweep but log BOTH reps per query, plus
executor storage-memory status between queries — the regression probe."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES, STAGE_BACKED
    from src_to_kb_spark.operators.extract import extract_pages
    from src_to_kb_spark.session import get_spark
    from src_to_kb_spark.sources.pages import load_pages

    spark = get_spark("benchlog", cpus=CPUS, shuffle_partitions=max(CPUS, 8))
    qs = entrymod.queries()
    extract_pages(load_pages(spark, SF_DIR)).write.format("noop").mode(
        "overwrite").save()
    for name in STAGE_BACKED:
        qs[name](spark, SF_DIR)

    sc = spark.sparkContext
    out = {}
    for name in BENCH_QUERIES:
        reps = []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        # count of cached RDD blocks in the block manager
        n_cached = len(sc._jsc.sc().getRDDStorageInfo())
        out[name] = {"reps": reps, "min": min(reps), "rdds_cached": n_cached}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"TOTAL_MIN": round(sum(v["min"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
