"""Characterize the beyond-broadcast slot-table probe (VERDICT r01 #4).

Builds the sf0.1 bench corpus filter as a distributed table artifact,
then times the probe strategies over the same 2x probe corpus:

  a. probe_sql        — 3 shuffled-hash joins, probe rows carry all cols
  b. probe_sql_narrow — same joins but only the 16-byte digest pair
                        rides the shuffles; one join-back at the end
  c. probe_xoragg     — posexplode the 3 slot indexes, ONE shuffled
                        join + bit_xor re-aggregate, then join-back
  d. probe (cogroup)  — Arrow shard-cogrouped kernel
  e. broadcast probe_sql — the within-threshold reference point

Usage: python tools/probe_table_bench.py [sf_dir]
Prints one JSON line per strategy; meant for BASELINE.md's crossover
table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from xorfilter_net_spark.filters.table import build_xor_filter_table  # noqa: E402


ROUNDS = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "3"))


def timed(label, fn, n_probe, results, rounds=ROUNDS):
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        assert n == n_probe, f"{label}: false negatives {n_probe - n}"
        best = dt if best is None else min(best, dt)
    results[label] = {
        "sec": round(best, 2),
        "keys_per_sec": int(n_probe / best),
    }
    print(json.dumps({label: results[label]}), flush=True)


def member_count(df):
    return df.agg(
        F.sum(F.col("is_member").cast("long")).alias("n")
    ).collect()[0]["n"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else bench.SF_DIR
    spark = bench.make_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    art_root = tempfile.mkdtemp(prefix="xorprobe_art_")
    tmp = tempfile.mkdtemp(prefix="xorprobe_probe_")
    results: dict = {}
    try:
        corpus = bench.scaled_corpus(spark, sf_dir, bench.REPLICAS).persist()
        n_keys = corpus.count()
        ppath = f"{tmp}/probes"
        (
            corpus.crossJoin(spark.range(bench.PROBE_MULT))
            .select("key")
            .repartition(2 * bench.BENCH_SHARDS)
            .write.mode("overwrite")
            .parquet(ppath)
        )
        probe_df = spark.read.parquet(ppath)
        n_probe = probe_df.count()
        print(
            json.dumps({"n_keys": n_keys, "n_probes": n_probe, "sf": sf_dir}),
            flush=True,
        )
        tab = build_xor_filter_table(
            corpus, "key", f"{art_root}/main", num_shards=bench.BENCH_SHARDS,
            width=16, seed=12345, jvm_digests=True,
        )
        corpus.unpersist()

        # (a) current 3-join shuffled-hash probe (twice: first pass pays
        # slot decode+persist; second is steady state)
        timed("a_probe_sql_cold",
              lambda: member_count(tab.probe_sql(probe_df, "key")),
              n_probe, results, rounds=1)
        timed("a_probe_sql_steady",
              lambda: member_count(tab.probe_sql(probe_df, "key")),
              n_probe, results)

        params_df, slots_df = tab._sqlprobe_cache

        # (c) explode + bit_xor single-join variant, verdict joined back
        from xorfilter_net_spark.filters.spark_build import _JVM_D1_SALT
        from xorfilter_net_spark.filters.spark_build import (
            _MASK_BITS,
        )

        def xoragg(joinback: bool):
            t = "__xorsql_"
            key = F.col("key")
            base = probe_df.withColumns(
                {
                    f"{t}d0": F.xxhash64(key),
                    f"{t}d1": F.xxhash64(key, F.lit(_JVM_D1_SALT)),
                }
            ).withColumn(
                f"{t}sh",
                F.pmod(F.col(f"{t}d0"), F.lit(tab.num_shards)).cast("int"),
            )
            base = base.join(F.broadcast(params_df), f"{t}sh")

            def u64mod(x, w, c):
                return F.when(x >= 0, F.pmod(x, w)).otherwise(
                    F.pmod(F.pmod(x, w) + c, w)
                )

            d0 = F.col(f"{t}d0")
            from xorfilter_net_spark.filters.spark_build import FP_SEED_SIGNED

            base = base.withColumns(
                {
                    f"{t}i{j}": F.col(f"{t}off{j}")
                    + u64mod(
                        F.xxhash64(d0, F.col(f"{t}sd{j}")),
                        F.col(f"{t}w{j}"),
                        F.col(f"{t}c{j}"),
                    )
                    for j in range(3)
                }
            ).withColumn(
                f"{t}fp",
                F.xxhash64(F.col(f"{t}d1"), F.lit(FP_SEED_SIGNED)).bitwiseAND(
                    F.lit(int(_MASK_BITS[tab.width]))
                ),
            )
            # verdicts are a pure function of the digest pair: dedup
            # before the explode (a duplicated probe row would bit_xor
            # each slot value twice and cancel to zero)
            skinny = base.dropDuplicates([f"{t}d0", f"{t}d1"]).select(
                f"{t}d0", f"{t}d1", f"{t}fp", f"{t}pres",
                F.explode(
                    F.array(*[F.col(f"{t}i{j}") for j in range(3)])
                ).alias("sidx"),
            )
            j = skinny.join(slots_df.hint("shuffle_hash"), "sidx")
            agg = (
                j.groupBy(f"{t}d0", f"{t}d1")
                .agg(
                    F.expr("bit_xor(sval)").alias("x"),
                    F.first(f"{t}fp").alias("fp"),
                    F.first(f"{t}pres").alias("pres"),
                )
                .withColumn(
                    "is_member",
                    (F.col("x") == F.col("fp")) & F.col("pres"),
                )
            )
            if not joinback:
                return agg
            back = probe_df.withColumns(
                {
                    f"{t}d0": F.xxhash64(key),
                    f"{t}d1": F.xxhash64(key, F.lit(_JVM_D1_SALT)),
                }
            )
            return back.join(
                agg.select(f"{t}d0", f"{t}d1", "is_member"),
                [f"{t}d0", f"{t}d1"],
            )

        # (the count over the bare agg would be per-distinct-digest;
        # probes are duplicated, so compare via join-back for
        # apples-to-apples with the row-preserving probe contract)
        timed("c_xoragg_joinback",
              lambda: member_count(xoragg(True)), n_probe, results)

        # (d) cogroup Arrow probe
        timed("d_probe_cogroup",
              lambda: member_count(tab.probe(probe_df, "key")),
              n_probe, results)

        # (e) broadcast reference point
        from xorfilter_net_spark.filters.spark_build import probe_sql

        sxf = tab.to_sharded()
        plan_e = probe_sql(sxf, probe_df, "key")
        timed("e_broadcast_sql",
              lambda: member_count(plan_e),
              n_probe, results)

        print(json.dumps({"summary": results}), flush=True)
    finally:
        shutil.rmtree(art_root, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
