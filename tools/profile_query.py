"""Round-9 profiling helper: time declared queries in isolation and dump
their formatted plans (guide §1: measure first, noop sink, labeled jobs).

Usage:
  python tools/profile_query.py [--reps N] [--suffix before] [--plans-dir plans/r09] name...
  python tools/profile_query.py --top 40            # 40 most expensive from BENCH_LOCAL.json

Prints one JSON line {"name": {"min": s, "times": [...]}} per query plus a
total. Plans go to <plans-dir>/<name>_<suffix>.txt when --suffix is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entrymod  # noqa: E402
from pubsub_mapreduce_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--suffix", default=None)
    ap.add_argument("--plans-dir", default=os.path.join(HERE, "plans", "r09"))
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    names = list(args.names)
    if args.top:
        with open(os.path.join(HERE, "BENCH_LOCAL.json")) as f:
            doc = json.load(f)
        names += [
            k
            for k, _ in sorted(
                doc["queries"].items(), key=lambda kv: -kv[1]
            )[: args.top]
            if k not in names
        ]

    if not args.no_warm:
        force(queries["q5_revenue_by_nation"](spark, sf_dir))

    out = {}
    for name in names:
        fn = queries[name]
        if args.suffix:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "times": times}
        print(json.dumps({name: out[name]}), flush=True)

    print(
        json.dumps(
            {
                "total_min_sum": round(sum(v["min"] for v in out.values()), 3),
                "n": len(out),
            }
        )
    )


if __name__ == "__main__":
    main()
