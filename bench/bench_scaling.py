"""Two-parallelism scaling evidence (SURVEY.md §5.2-7, §6).

No real cluster exists in this sandbox, so the north rule's N-vs-4N
executor criterion is evidenced by running the IDENTICAL job at local[8]
and local[32] on the IDENTICAL seed-42 input (each in a fresh subprocess
so JVM/session state cannot leak) and reporting throughput at both plus
  efficiency = throughput_32 / (4 * throughput_8).

Writes BENCH/BASELINE.md. Usage: python bench/bench_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 300000


def run_at(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        HFS_BENCH_PAGES=str(N_PAGES),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run_at(8)
    r32 = run_at(32)
    tp8, tp32 = r8["value"], r32["value"]
    eff = tp32 / (4 * tp8)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Generated {stamp} by `bench/bench_scaling.py` (seed-42 synthetic pages,
n={N_PAGES}; identical input and job at both parallelism levels; each run
in a fresh subprocess/JVM). Sandbox stand-in for the north rule's N vs 4N
executors criterion (no real cluster available — SURVEY.md §5.2-7).

| parallelism | pages/sec | pipeline sec |
|---|---|---|
| local[8]  (N)  | {tp8:,.1f} | {r8['queries']['pipeline_spatial']} |
| local[32] (4N) | {tp32:,.1f} | {r32['queries']['pipeline_spatial']} |

**Scaling efficiency = throughput_32 / (4 x throughput_8) = {eff:.3f}**
(north-rule target: >= 0.8)

Per-query seconds at local[32]: `{json.dumps(r32['queries'])}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"tp8": tp8, "tp32": tp32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
