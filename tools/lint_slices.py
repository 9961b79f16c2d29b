#!/usr/bin/env python
"""Fixed-slice decomposition of conv_lint's N vs 4N wall.

The r05 scaling campaign measured conv_lint's local[8] wall as BIMODAL
(57-97 s at zero recorded steal) while its local[2] wall is stable to
+/-1% — the same shape the triangle fixed-slice table adjudicated in
r03. This tool splits the operator into its two physical phases and
times each at both levels in fresh pinned JVMs, so the inflation can be
ATTRIBUTED to a stage instead of argued:

  scan   — the turn derivation + map-side flag projection, terminated
           by a noop sink BEFORE any exchange (pure codegen map work);
  full   — the complete lint (scan + conv_id exchange + window +
           aggregate); full - scan ~= the exchange/window/agg slice.

Usage: python tools/lint_slices.py   (env knobs as scaling_pipeline)
Prints one JSON line; does NOT write BASELINE.md (paste the table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "2048"))
REPS = int(os.environ.get("SPARK_GRAFT_SLICE_REPS", "2"))


def child(cpus: int, corpus_path: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import force, make_spark
    from xorfilter_net_spark.pipeline.conv_lint import conversation_lint

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    corpus.count()

    def turns():
        return corpus.select(
            F.concat(F.lit("conv-"), F.col("doc_id").cast("string")).alias(
                "conv_id"
            ),
            "text",
            F.explode(F.expr("sequence(0, cast(doc_id % 8 as int))")).alias(
                "turn_idx"
            ),
        ).select(
            "conv_id",
            "turn_idx",
            F.expr(
                "case cast(turn_idx % 3 as int) when 0 then 'user' "
                "when 1 then 'assistant' else 'tool' end"
            ).alias("role"),
            F.expr("substr(text, 1 + cast(turn_idx as int) * 37, 96)").alias(
                "text"
            ),
            F.expr(
                "case when turn_idx % 3 = 2 then 'tool_' || "
                "cast(cast(substr(conv_id, 6) as bigint) % 5 as string) end"
            ).alias("tool"),
            (
                F.expr("cast(substr(conv_id, 6) as bigint)") * 1000
                + F.col("turn_idx")
                + 1704067200
            )
            .cast("long")
            .alias("ts_epoch"),
        )

    def scan_slice():
        # the lint's map phase, terminated before any exchange: same
        # per-row flag expressions, no window, no aggregate
        t = turns()
        idx = F.col("turn_idx")
        return t.select(
            "conv_id",
            "turn_idx",
            F.col("ts_epoch"),
            F.when(idx.isNull(), F.lit(1))
            .otherwise(
                (
                    ~F.col("role").eqNullSafe(
                        F.element_at(
                            F.array(
                                F.lit("user"), F.lit("assistant"), F.lit("tool")
                            ),
                            F.pmod(idx, 3).cast("int") + 1,
                        )
                    )
                ).cast("long")
            )
            .alias("role_viol"),
            (F.coalesce(F.col("text"), F.lit("")) == "").cast("long").alias(
                "empty_viol"
            ),
        )

    def steal_total():
        with open("/proc/stat") as f:
            p = f.readline().split()
        v = list(map(int, p[1:]))
        return v[7], sum(v)

    out: dict = {"cpus": cpus, "reps": REPS}
    for name, build in (("scan", scan_slice), ("full", lambda: conversation_lint(turns()))):
        walls, steals = [], []
        for _ in range(REPS):
            s0, c0 = steal_total()
            t0 = time.monotonic()
            force(build())
            walls.append(round(time.monotonic() - t0, 1))
            s1, c1 = steal_total()
            steals.append(round(100.0 * (s1 - s0) / max(c1 - c0, 1), 2))
        out[name] = {"walls": walls, "steal_pct": steals}
    print("CHILD_RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    sys.path.insert(0, REPO)
    import shutil
    import tempfile

    from bench import make_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_spark(8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="xfns_lintslice_")
    try:
        corpus_path = f"{tmp}/docs"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        from pyspark.sql import functions as F

        n = docs.count()
        reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
        big = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * (n * 10)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" r"), F.col("rep").cast("string")
            ).alias("text"),
        )
        big.write.mode("overwrite").parquet(corpus_path)
        spark.stop()

        results = {}
        for cpus in (2, 8):
            pin = ["taskset", "-c", f"0-{cpus - 1}"]
            r = subprocess.run(
                pin
                + [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--child",
                    str(cpus),
                    corpus_path,
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            for line in r.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    results[cpus] = json.loads(line[len("CHILD_RESULT "):])
                    break
            else:
                raise RuntimeError(r.stdout[-1500:] + r.stderr[-1500:])
        print(json.dumps(results))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
