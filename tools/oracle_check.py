"""Local twin of the driver's correctness gate: run selected
``__spark_entry__.queries()`` entries AND their ``oracle_sql()`` DuckDB
equivalents over the same parquet tables, then compare row count,
column names, and the full sorted value multiset.

Usage:
    python tools/oracle_check.py [--sf DIR] [--json OUT] [key ...]

With no keys, checks every registry query — oracle-backed entries get
the full rows/schema/values compare, the documented no-oracle tier
records a rows-only result. ``--json OUT`` additionally writes the
per-key results in the driver's CORRECTNESS record shape, so a full
sweep can be committed as a round artifact (TAILCHECK_r{N}.json).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: short repr survives the
        # float32/float64 and DECIMAL/DOUBLE seams the oracles already
        # guard with explicit rounding
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        # Spark hands back datetime even for date-valued results;
        # DuckDB hands back date — the driver's comparator treats a
        # midnight timestamp and its date as the same value, so strip
        # the zero time here too
        iso = v.isoformat()
        return iso[:-9] if iso.endswith("T00:00:00") else iso
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # stringify for the sort only — mixed None/str/int tuples are not
    # orderable in Python (the driver's comparator hashes normalized
    # strings; this local twin mirrors that by sorting on repr)
    out = sorted((tuple(_norm(r[i]) for i in order) for r in rows),
                 key=repr)
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--json", default=None,
                    help="write per-key results (driver CORRECTNESS "
                         "shape) to this path")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from cassandra_es_index_spark.session import get_spark

    spark = get_spark("oracle-check")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    keys = args.keys or list(queries)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    results: dict[str, dict] = {}
    for k in keys:
        if k not in queries:
            print(f"{k}: NO SUCH QUERY")
            failed.append(k)
            results[k] = {"rows_match": None, "schema_match": None,
                          "hash_match": None, "spark_rows": None,
                          "oracle_rows": None, "err": "no_such_query"}
            continue
        if k not in oracles:
            try:
                sdf = queries[k](spark, args.sf)
                n = sdf.count()
            except Exception as e:  # noqa: BLE001
                print(f"{k}: ERR {type(e).__name__}: {e}")
                failed.append(k)
                results[k] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"{type(e).__name__}: {e}"[:300]}
                continue
            print(f"{k}: no oracle — spark rows={n}")
            results[k] = {"rows_match": None, "schema_match": None,
                          "hash_match": None, "spark_rows": n,
                          "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            sdf = queries[k](spark, args.sf)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[k])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"{k}: ERR {type(e).__name__}: {e}")
            failed.append(k)
            results[k] = {"rows_match": None, "schema_match": None,
                          "hash_match": None, "spark_rows": None,
                          "oracle_rows": None,
                          "err": f"{type(e).__name__}: {e}"[:300]}
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        s_c, s_v = _rows_to_set(scols, srows)
        o_c, o_v = _rows_to_set(ocols, orows)
        ok_vals = ok_schema and s_v == o_v
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"{k}: {status} spark={len(srows)} oracle={len(orows)}"
              + ("" if ok_schema else f" SCHEMA {scols} vs {ocols}"))
        results[k] = {"rows_match": ok_rows, "schema_match": ok_schema,
                      "hash_match": ok_vals, "spark_rows": len(srows),
                      "oracle_rows": len(orows), "err": None}
        if status == "FAIL":
            failed.append(k)
            if ok_schema and ok_rows:
                diffs = [(a, b) for a, b in zip(s_v, o_v) if a != b]
                for a, b in diffs[:3]:
                    print(f"   spark  {a}\n   oracle {b}")
                print(f"   ({len(diffs)} differing rows of {len(s_v)})")
    if args.json:
        import json as _json
        with open(args.json, "w") as fh:
            _json.dump(results, fh, indent=1)
        print(f"wrote {args.json} ({len(results)} keys)")
    print(f"\n{len(keys) - len(failed)}/{len(keys)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
