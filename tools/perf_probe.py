"""Per-query optimization probe (r15): isolate one or more registry
queries with the bench's methodology — warmed state via
``bench_prepare``, noop-sink materialization, N timed runs — and dump
``.explain("formatted")`` for each to ``plans/<tag>/<key>_<suffix>.txt``.

Usage:
    python tools/perf_probe.py [--sf DIR] [--runs N] [--plans-dir DIR]
                               [--suffix before|after] [--no-prepare]
                               key [key ...]

Prints one ``key: [t1, t2, ...] median=...`` line per query to stderr
and a compact JSON map to stdout. Timing methodology matches bench.py
(full noop materialization per run); plans are captured once after the
timed runs so plan capture cost is not attributed to the timing.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None,
                    help="dump explain('formatted') per key here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-prepare", action="store_true",
                    help="skip bench_prepare (cold-state timing)")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cassandra_es_index_spark import get_spark

    spark = get_spark("cassandra-es-index-spark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    queries = entrymod.queries()
    unknown = [k for k in args.keys if k not in queries]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    docs = entrymod._t(spark, args.sf, "documents").cache()
    docs.count()
    if not args.no_prepare:
        t0 = time.perf_counter()
        entrymod.bench_prepare(spark, args.sf)
        print(f"  bench_prepare: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)

    from bench import _free_query_state

    out: dict[str, float] = {}
    for key in args.keys:
        fn = queries[key]
        times = []
        builds = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe:{key}:{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            builds.append(round(t1 - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = round(statistics.median(times), 3)
        out[key] = med
        print(f"  {key}: {times} median={med} "
              f"(df-construction {builds})", file=sys.stderr)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = spark._jvm.org.apache.spark.sql.api.python \
                .PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.plans_dir,
                                f"{key}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"  wrote {path}", file=sys.stderr)
        # r15.2: free the key's dead pinned/broadcast state between
        # keys, outside every timed region — same hygiene as bench._run
        _free_query_state(spark)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
