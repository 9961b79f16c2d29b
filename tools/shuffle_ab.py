#!/usr/bin/env python
"""A/B local[N] shuffle-writer configs for the construction repartition.

Times digest->repartition(shards)->noop under different shuffle configs
in fresh JVMs. Usage: python tools/shuffle_ab.py [cpus] [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "default": {},
    "sortwriter": {"spark.shuffle.sort.bypassMergeThreshold": "1"},
    "nocompress": {"spark.shuffle.compress": "false"},
    "sort_nocompress": {
        "spark.shuffle.sort.bypassMergeThreshold": "1",
        "spark.shuffle.compress": "false",
    },
    "lz4_small_buf": {"spark.shuffle.file.buffer": "1m"},
}


def one(cpus: int, replicas: int, cfg_name: str) -> None:
    from pyspark.sql import functions as F

    from bench import make_spark, scaled_corpus
    from xorfilter_net_spark.filters.spark_build import key_digests_jvm

    extra = CONFIGS[cfg_name]
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    corpus = scaled_corpus(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), replicas).persist()
    n = corpus.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    dig = key_digests_jvm(corpus, "key").withColumn(
        "shard", F.pmod(F.col("d0"), F.lit(128)).cast("int")
    )
    noop(dig.repartition(128, "shard"))  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        noop(dig.repartition(128, "shard"))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"cfg": cfg_name, "cpus": cpus, "n": n, "shuffle_sec": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 3:
        one(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    else:
        cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        for name in CONFIGS:
            r = subprocess.run(
                [sys.executable, __file__, str(cpus), str(reps), name],
                capture_output=True, text=True, cwd=REPO, timeout=900,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            print(line[-1] if line else f"FAIL {name}: {r.stderr[-500:]}")
