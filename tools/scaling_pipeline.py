#!/usr/bin/env python
"""Two-parallelism scaling evidence for the TRAINING-DATA operators.

Companion to ``tools/scaling_bench.py`` (which covers the filter
construction+probe headline): the same N vs 4N discipline applied to
the curation-side pipeline — span dedup, MinHash near-dup, corpus-LM
scoring, and the end-to-end curation pipeline — each timed on the SAME
input at CPU-pinned ``local[N]`` and ``local[4N]`` in fresh JVMs.

    efficiency = (throughput_4N / throughput_N) / 4
               = wall_N / (4 * wall_4N)

Usage::

    python tools/scaling_pipeline.py          # N=2 vs 8, sf0.1
    python tools/scaling_pipeline.py --child 8 op1 op2   # (internal)

Appends a '## Measured scaling — training-data operators' section to
BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PIN = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") != "0"
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))

OPS = [
    "dup_span_report",
    "minhash_near_dup_pairs",
    "lm_coverage_documents",
    "curate_corpus_documents",
]


def child(cpus: int, ops: list[str]) -> None:
    sys.path.insert(0, REPO)
    from bench import make_spark
    import xorfilter_net_spark.entrypoints as ep

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + python worker pool once, outside any timed window
    ep.QUERIES["text_features"](spark, SF_DIR).count()
    walls: dict[str, float] = {}
    for op in ops:
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.time()
            ep.QUERIES[op](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        walls[op] = best
    print("CHILD_RESULT " + json.dumps(walls))
    spark.stop()


def run_at(cpus: int) -> dict[str, float]:
    pin = ["taskset", "-c", f"0-{cpus - 1}"] if PIN else []
    out = subprocess.run(
        pin
        + [sys.executable, os.path.abspath(__file__), "--child", str(cpus)]
        + OPS,
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
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
        child(int(sys.argv[2]), sys.argv[3:])
        return
    lo = run_at(N)
    hi = run_at(4 * N)
    rows = []
    for op in OPS:
        eff = lo[op] / (4.0 * hi[op])
        rows.append(
            {
                "op": op,
                f"wall_{N}": round(lo[op], 2),
                f"wall_{4 * N}": round(hi[op], 2),
                "efficiency": round(eff, 3),
            }
        )
    result = {"n": N, "four_n": 4 * N, "sf_dir": SF_DIR, "ops": rows}
    print(json.dumps(result))

    lines = [
        "",
        "## Measured scaling — training-data operators",
        "",
        f"Same discipline as the construction/probe table (fresh CPU-pinned "
        f"JVM per level, same sf0.1 input, best of {ROUNDS} rounds; "
        f"`python tools/scaling_pipeline.py`): wall seconds at "
        f"local[{N}] (N) vs local[{4 * N}] (4N) and efficiency "
        f"= wall_N / (4 x wall_4N).",
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
