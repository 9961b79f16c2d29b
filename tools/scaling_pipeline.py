#!/usr/bin/env python
"""Two-parallelism scaling evidence for the TRAINING-DATA operators.

Companion to ``tools/scaling_bench.py`` (construction+probe headline):
the same N vs 4N discipline — fresh CPU-pinned JVM per level, identical
input — applied to the curation-side operators.

The sf0.1 documents table is only ~5k rows; at that size the contract
queries finish in seconds and the wall measures scheduling overhead,
not data processing (a first cut measured "efficiency 0.23-0.49" that
was purely fixed cost). So the harness first materializes a REPLICATED
corpus — each replica's doc_ids shifted and its text tagged with a
replica token, so per-replica structure (dup-injected near-copies,
vocabulary) is preserved while nothing collides across replicas and
outputs grow linearly — sized so the slow level runs minutes of real
work, then times each operator once per level.

    efficiency = wall_N / (4 * wall_4N)

Usage::

    python tools/scaling_pipeline.py          # N=2 vs 8
    SPARK_GRAFT_SCALE_REPLICAS=32 python tools/scaling_pipeline.py

Appends a '## Measured scaling — training-data operators' section to
BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PIN = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") != "0"
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "32"))

OPS = os.environ.get(
    "SPARK_GRAFT_SCALE_OPS",
    "dup_span_report,normalized_dedup,lm_coverage,curate",
).split(",")


def _replicated_corpus(spark, replicas: int):
    """documents x replicas with the dup-injection pattern preserved
    per replica (truncated near-copies), replica-tagged text."""
    from pyspark.sql import functions as F

    # crossJoin with a replica range, NOT a per-replica union fold: the
    # fold builds 2 x replicas plan branches and Catalyst analysis blows
    # up past ~2000 branches (x2048 failed in tree transform); the
    # crossJoin produces the IDENTICAL row set (same doc_id arithmetic,
    # same per-replica text tags) from a 2-branch plan at any replica
    # count
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    rep = spark.range(replicas).withColumnRenamed("id", "rep")
    tag = F.concat(F.lit(" rep"), F.col("rep").cast("string"))
    base = docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.concat("text", tag).alias("text"),
    )
    dups = (
        docs.filter("doc_id % 7 = 0")
        .crossJoin(rep)
        .select(
            (
                F.col("doc_id") + F.col("rep") * 10_000_000 + 1_000_000
            ).alias("doc_id"),
            F.concat(
                F.expr(
                    "substr(text, 1, cast(floor(length(text) * 0.9) as int))"
                ),
                tag,
            ).alias("text"),
        )
    )
    # spread before the write: the crossJoin inherits the single-file
    # scan's partitioning
    return base.unionAll(dups).repartition(64, "doc_id")


def child(cpus: int, corpus_path: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import make_spark

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    corpus.count()  # warm: JVM, scan, python workers

    from xorfilter_net_spark.dedup.minhash import near_duplicate_pairs
    from xorfilter_net_spark.dedup.spans import duplicated_spans
    from xorfilter_net_spark.pipeline.curate import curate_corpus
    from xorfilter_net_spark.text.ngram_lm import lm_coverage_signals
    from xorfilter_net_spark.text.normalize import normalized_dedup

    from xorfilter_net_spark.pipeline.curate_transcripts import (
        curate_transcript_pairs,
    )
    from xorfilter_net_spark.text.dsir import dsir_scores

    def _turns():
        # same derivation as sources/transcripts.py but over the
        # replicated corpus (no lpad: replica-shifted doc_ids exceed 8
        # digits and lpad TRUNCATES, which would collide conv_ids)
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
        )

    def _turns_full():
        did = F.expr("cast(substr(conv_id, 6) as bigint)")
        return _turns().select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.expr(
                "case when turn_idx % 3 = 2 then "
                "'tool_' || cast(cast(substr(conv_id, 6) as bigint) % 5 "
                "as string) end"
            ).alias("tool"),
            (did * 1000 + F.col("turn_idx") + 1704067200)
            .cast("long")
            .alias("ts_epoch"),
        )

    def _conv_lint():
        from xorfilter_net_spark.pipeline.conv_lint import conversation_lint

        return conversation_lint(_turns_full())

    def _turn_merge():
        from xorfilter_net_spark.pipeline.turn_merge import (
            merge_consecutive_turns,
        )

        return merge_consecutive_turns(_turns_full())

    def _kmeans(spark):
        from xorfilter_net_spark.ann.kmeans import kmeans_assign, kmeans_fit

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        reps = int(os.environ.get("SPARK_GRAFT_SCALE_KM_REPLICAS", "512"))
        rep = spark.range(reps).withColumnRenamed("id", "rep")
        big = (
            emb.crossJoin(rep)
            .select(
                (F.col("vec_id") + F.col("rep") * 10_000_000).alias(
                    "vec_id"
                ),
                F.expr(
                    "transform(embedding, (x, j) -> x + "
                    "cast(rep as double) * 0.0007d "
                    "* cast(j % 5 as double))"
                ).alias("embedding"),
            )
            # FIXED partition count: the job must be identical at every
            # parallelism level (only the master local[N] varies)
            .repartition(32)
            .persist()
        )
        big.count()
        fit = kmeans_fit(
            big, "vec_id", "embedding", k=32, iters=4, seed=11
        )
        return kmeans_assign(big, "vec_id", "embedding", fit["centroids"])

    def _triangle(spark):
        from xorfilter_net_spark.relational.graph import (
            cooccurrence_edges,
            triangle_counts,
        )

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        )
        # disjoint shifted replicas grow the graph linearly (structure
        # preserved, no cross-replica edges) so real wedge work, not the
        # fixed driver/broadcast stages, dominates the measured wall
        reps = int(os.environ.get("SPARK_GRAFT_SCALE_TRI_REPLICAS", "1"))
        parts = [
            li.select(
                (F.col("l_orderkey") + i * 100_000_000).alias("l_orderkey"),
                (F.col("l_partkey") + i * 10_000_000).alias("l_partkey"),
            )
            for i in range(reps)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionAll(p)
        return triangle_counts(
            cooccurrence_edges(big, "l_orderkey", "l_partkey"), prune="xor"
        )

    eval_df = corpus.filter("doc_id % 37 = 0").select("text")
    jobs = {
        "dup_span_report": lambda: duplicated_spans(corpus, k=10),
        # the flagship near-dup path: map-only signatures, banded-LSH
        # candidate shuffle, exact-Jaccard verify joins — the replica
        # generator's 90%-truncated copies plant real near-dup pairs in
        # every replica, so the candidate/verify stages carry real work
        "minhash_near_dup": lambda: near_duplicate_pairs(
            corpus, "doc_id", "text", tau=0.5
        ),
        "normalized_dedup": lambda: normalized_dedup(corpus),
        "lm_coverage": lambda: lm_coverage_signals(corpus, min_count=2),
        "curate": lambda: curate_corpus(corpus, eval_df),
        "curate_transcripts": lambda: curate_transcript_pairs(_turns()),
        # r04 transcript-hygiene ops: lint needs the full turn shape
        # (tool + ts_epoch, same derivation as sources/transcripts.py)
        "conv_lint": lambda: _conv_lint(),
        "turn_merge": lambda: _turn_merge(),
        "dsir_scores": lambda: dsir_scores(
            corpus, corpus.filter("doc_id % 31 = 1"), "doc_id", "text"
        ),
        # graph family: raw sf0.1 lineitem (1.2M-edge co-purchase graph)
        # — big enough on its own; run with SPARK_GRAFT_SCALE_REPLICAS=1
        # to skip the (unused) corpus replication
        "triangle": lambda: _triangle(spark),
        # distributed Lloyd k-means over a replicated embedding corpus
        # (jittered per replica so cells stay non-degenerate); run with
        # SPARK_GRAFT_SCALE_REPLICAS=1 — the text corpus is unused
        "kmeans": lambda: _kmeans(spark),
    }

    def force(df) -> int:
        # hash-sum over EVERY output column: a bare count() lets the
        # optimizer eliminate 1:1 joins / prune computed columns and
        # times a plan that never produced the values
        h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        row = df.select(h.alias("h")).agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("s")
        ).collect()[0]
        return int(row["n"])

    def steal_total():
        try:
            with open("/proc/stat") as f:
                vals = [int(v) for v in f.readline().split()[1:]]
            return (vals[7] if len(vals) > 7 else 0), sum(vals)
        except Exception:
            return 0, 1

    walls: dict[str, float] = {}
    rows: dict[str, int] = {}
    steals: dict[str, float] = {}
    for op in OPS:
        s0, c0 = steal_total()
        t0 = time.time()
        rows[op] = force(jobs[op]())
        walls[op] = time.time() - t0
        s1, c1 = steal_total()
        steals[op] = round(100.0 * (s1 - s0) / max(c1 - c0, 1), 2)
    print(
        "CHILD_RESULT "
        + json.dumps({"walls": walls, "rows": rows, "steal_pct": steals})
    )
    spark.stop()


def run_at(cpus: int, corpus_path: str) -> dict:
    pin = ["taskset", "-c", f"0-{cpus - 1}"] if PIN else []
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR}
    # Same-spec-executor memory model: on a real cluster, growing from N
    # to 4N executors carries 4x the aggregate memory (each executor
    # brings its own); a FIXED local heap instead starves the 4N level
    # to 1/4 the per-task memory the N level enjoys, reading pure memory
    # pressure as a scaling defect. With SPARK_GRAFT_SCALE_MEM_PER_CORE
    # set (MiB per core), each level's heap is per_core x cores — the
    # faithful cluster analogy. Unset -> the legacy fixed
    # SPARK_GRAFT_DRIVER_MEM behavior.
    per_core = os.environ.get("SPARK_GRAFT_SCALE_MEM_PER_CORE")
    if per_core:
        env["SPARK_GRAFT_DRIVER_MEM"] = f"{int(per_core) * cpus}m"
    out = subprocess.run(
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
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"child local[{cpus}] produced no result:\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return

    tmp = tempfile.mkdtemp(prefix="xfns_scale_corpus_")
    corpus_path = os.path.join(tmp, "corpus")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import sys; sys.path.insert(0, %r)\n"
                "from bench import make_spark\n"
                "import tools.scaling_pipeline as sp\n"
                "spark = make_spark(8)\n"
                "spark.sparkContext.setLogLevel('ERROR')\n"
                "sp._replicated_corpus(spark, %d).write.mode('overwrite')"
                ".parquet(%r)\n"
                "print('GEN_OK', spark.read.parquet(%r).count())\n"
            )
            % (REPO, REPLICAS, corpus_path, corpus_path),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if "GEN_OK" not in gen.stdout:
        raise RuntimeError(gen.stdout[-1000:] + gen.stderr[-2000:])
    n_rows = int(gen.stdout.split("GEN_OK")[1].split()[0])

    try:
        lo = run_at(N, corpus_path)
        hi = run_at(4 * N, corpus_path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert lo["rows"] == hi["rows"], (lo["rows"], hi["rows"])
    rows = []
    for op in OPS:
        eff = lo["walls"][op] / (4.0 * hi["walls"][op])
        rows.append(
            {
                "op": op,
                f"wall_{N}": round(lo["walls"][op], 1),
                f"wall_{4 * N}": round(hi["walls"][op], 1),
                "efficiency": round(eff, 3),
                f"steal_{N}": lo.get("steal_pct", {}).get(op),
                f"steal_{4 * N}": hi.get("steal_pct", {}).get(op),
            }
        )
    result = {
        "n": N,
        "four_n": 4 * N,
        "replicas": REPLICAS,
        "corpus_rows": n_rows,
        "ops": rows,
    }
    print(json.dumps(result))

    lines = [
        "",
        f"## Measured scaling — training-data operators ({', '.join(OPS)})",
        "",
        f"Fresh CPU-pinned JVM per level, identical input: the sf0.1 "
        f"documents table replicated x{REPLICAS} with per-replica tags "
        f"({n_rows:,} docs — sized so the local[{N}] level runs minutes "
        f"of real work; the un-replicated 5k-row table finishes in "
        f"seconds and measures scheduling, not scaling). "
        f"`python tools/scaling_pipeline.py`; efficiency = "
        f"wall_N / (4 x wall_4N); outputs row-identical across levels.",
        "",
        f"| Operator | local[{N}] s | local[{4 * N}] s | efficiency |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['op']} | {r[f'wall_{N}']} | {r[f'wall_{4 * N}']} "
            f"| {r['efficiency']} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    print("appended to BASELINE.md")


if __name__ == "__main__":
    main()
