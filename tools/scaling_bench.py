#!/usr/bin/env python
"""Two-parallelism scaling-efficiency evidence (north_rule: N vs 4N).

No real cluster exists in this sandbox, so per the driver instruction the
"two cluster sizes" criterion is evidenced by running the SAME
construction+probe job on the SAME input at two ``local[N]`` parallelism
levels in fresh JVMs (fresh python worker pools too), and reporting
throughput at both plus the scaling efficiency

    efficiency = (throughput_4N / throughput_N) / 4

Usage::

    python tools/scaling_bench.py            # N=8 vs 4N=32, sf0.1
    SPARK_GRAFT_SCALE_N=4 python tools/scaling_bench.py   # 4 vs 16

Each run shells out to ``bench.py --throughput-only`` so JVM/session state
cannot leak between parallelism levels. Results are printed as one JSON
line and appended to ``BASELINE.md`` under '## Measured scaling'.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_at(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--throughput-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        check=True,
    )
    # last line of stdout is the JSON payload
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_at(N)
    hi = run_at(4 * N)
    ratio = 4 * N // N  # = 4
    eff_build = (
        hi["construction_keys_per_sec"] / lo["construction_keys_per_sec"]
    ) / ratio
    eff_probe = (hi["probe_keys_per_sec"] / lo["probe_keys_per_sec"]) / ratio
    result = {
        "metric": "scaling efficiency, local[N] -> local[4N], same input",
        "sf_dir": SF_DIR,
        "n_keys": hi["n_keys"],
        "N": N,
        "4N": 4 * N,
        "construction_keys_per_sec": {
            f"local[{N}]": lo["construction_keys_per_sec"],
            f"local[{4 * N}]": hi["construction_keys_per_sec"],
        },
        "probe_keys_per_sec": {
            f"local[{N}]": lo["probe_keys_per_sec"],
            f"local[{4 * N}]": hi["probe_keys_per_sec"],
        },
        "scaling_efficiency_construction": round(eff_build, 3),
        "scaling_efficiency_probe": round(eff_probe, 3),
        "target": 0.8,
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BASELINE.md")
    with open(md) as f:
        content = f.read()
    section = (
        "\n## Measured scaling (this sandbox)\n\n"
        "Same construction+probe job, same input "
        f"({result['n_keys']:,} keys derived from `{SF_DIR}`), two fresh-JVM "
        f"parallelism levels standing in for N vs 4N executors:\n\n"
        "| Parallelism | Construction keys/s | Probe keys/s |\n|---|---|---|\n"
        f"| local[{N}] (N) | {lo['construction_keys_per_sec']:,} | "
        f"{lo['probe_keys_per_sec']:,} |\n"
        f"| local[{4 * N}] (4N) | {hi['construction_keys_per_sec']:,} | "
        f"{hi['probe_keys_per_sec']:,} |\n\n"
        f"Scaling efficiency N->4N: **construction {eff_build:.3f}**, "
        f"**probe {eff_probe:.3f}** (target >=0.8).\n"
    )
    content = re.sub(
        r"\n## Measured scaling \(this sandbox\)\n.*", "", content, flags=re.S
    )
    with open(md, "w") as f:
        f.write(content + section)


if __name__ == "__main__":
    main()
