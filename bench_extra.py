"""Round-8 optimization harness (guide §1): isolate individual declared
queries with the noop sink, time min-of-N steady state, and dump
`.explain("formatted")` plans to plans/r08/.

This file is NOT the driver bench (bench.py stays frozen); it exists so
per-query before/after evidence can be captured at any SF without
re-running the whole suite.

Usage:
  python bench_extra.py [--sf-dir DIR] [--runs N] [--plans-to DIR] q1 q2 ...
  python bench_extra.py --all          # every BENCH_QUERIES entry
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-to", default=None, help="dump explain() here")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import bench as B
    import __spark_entry__ as E
    from harvester_fgp_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="hfs-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    names = list(B.BENCH_QUERIES) if args.all else args.queries
    qs = E.queries()
    out: dict = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = qs[name](spark, args.sf_dir)
        if args.plans_to:
            import contextlib
            import io

            os.makedirs(args.plans_to, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_to, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        samples = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
