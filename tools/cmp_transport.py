#!/usr/bin/env python
"""A/B the construction shuffle transport (rows vs packed blobs) at one
local[N]. Usage: python tools/cmp_transport.py [cpus] [replicas]"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHARDS = 128


def main() -> None:
    from bench import make_spark, scaled_corpus
    from xorfilter_net_spark.filters.table import build_xor_filter_table

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="xorcmp_")

    warm = scaled_corpus(spark, SF_DIR, max(REPLICAS // 16, 1)).persist()
    warm.count()
    for t in ("rows", "blob"):
        build_xor_filter_table(
            warm, "key", f"{tmp}/warm_{t}", num_shards=SHARDS, width=16,
            seed=1, jvm_digests=True, transport=t,
        )
    warm.unpersist()

    corpus = scaled_corpus(spark, SF_DIR, REPLICAS).persist()
    n = corpus.count()
    out = {"cpus": CPUS, "n_keys": n}
    # interleave r,b,r,b so VM drift can't bias one arm
    best = {"rows": float("inf"), "blob": float("inf")}
    for _ in range(2):
        for t in ("rows", "blob"):
            shutil.rmtree(f"{tmp}/m_{t}", ignore_errors=True)
            t0 = time.perf_counter()
            build_xor_filter_table(
                corpus, "key", f"{tmp}/m_{t}", num_shards=SHARDS, width=16,
                seed=12345, jvm_digests=True, transport=t,
            )
            best[t] = min(best[t], time.perf_counter() - t0)
    for t, dt in best.items():
        out[f"{t}_sec"] = round(dt, 3)
        out[f"{t}_keys_per_sec"] = int(n / dt)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
