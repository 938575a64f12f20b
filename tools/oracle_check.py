"""Local twin of the driver's correctness gate: run selected
``__spark_entry__.queries()`` entries AND their ``oracle_sql()`` DuckDB
equivalents over the same parquet tables, then compare row count,
column names, and the full sorted value multiset.

Usage:
    python tools/oracle_check.py [--sf DIR] [key ...]

With no keys, checks every query that has an oracle entry (slow).
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
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from cassandra_es_index_spark.session import get_spark

    spark = get_spark("oracle-check")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    keys = args.keys or [k for k in queries if k in oracles]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for k in keys:
        if k not in queries:
            print(f"{k}: NO SUCH QUERY")
            failed.append(k)
            continue
        if k not in oracles:
            sdf = queries[k](spark, args.sf)
            print(f"{k}: no oracle — spark rows={sdf.count()}")
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
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        s_c, s_v = _rows_to_set(scols, srows)
        o_c, o_v = _rows_to_set(ocols, orows)
        ok_vals = ok_schema and s_v == o_v
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(f"{k}: {status} spark={len(srows)} oracle={len(orows)}"
              + ("" if ok_schema else f" SCHEMA {scols} vs {ocols}"))
        if status == "FAIL":
            failed.append(k)
            if ok_schema and ok_rows:
                diffs = [(a, b) for a, b in zip(s_v, o_v) if a != b]
                for a, b in diffs[:3]:
                    print(f"   spark  {a}\n   oracle {b}")
                print(f"   ({len(diffs)} differing rows of {len(s_v)})")
    print(f"\n{len(keys) - len(failed)}/{len(keys)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
