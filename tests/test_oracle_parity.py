"""Emulates the driver's t2 gate: run every ``queries()`` entry and its
``oracle_sql()`` twin side-by-side, compare schema + row count + values
order-insensitively. Runs at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size check."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, ducks):
    got = _normalize(QUERIES[name](spark, sf_dir).toPandas())
    want = _normalize(ducks.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(name, spark, sf_dir):
    # rows-only check for the non-SQL-expressible ops
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    assert out.count() > 0
    assert "_score" in out.columns


def test_queries_oracles_consistent():
    assert set(ORACLES) <= set(QUERIES)
    missing = set(QUERIES) - set(ORACLES)
    # only the documented non-SQL-expressible ops may lack an oracle —
    # the probabilistic ANN/LSH tier graded by ann_recall
    # (multimodal_features graduated to oracle-backed r12: the real
    # PNG decode path is hash-checked against doc_id arithmetic)
    assert missing == {"dedup_minhash_lsh", "dedup_simhash",
                       "similarity_ann_lsh", "similarity_ivf_topk",
                       "similarity_ivf_disk", "ann_recall",
                       "dedup_clusters_lsh"}


def test_queries_dict_has_no_duplicate_keys():
    """The driver's 50-entry correctness window is positional; a duplicate
    dict key silently shadows an earlier entry (r05 verdict hygiene #3).
    Parse the source AST and assert every literal key in queries() /
    oracle_sql() is unique."""
    import ast as pyast
    import inspect

    src = inspect.getsource(entrymod)
    tree = pyast.parse(src)
    for fname in ("queries", "oracle_sql"):
        fn = next(n for n in tree.body
                  if isinstance(n, pyast.FunctionDef) and n.name == fname)
        keys = [k.value for node in pyast.walk(fn)
                if isinstance(node, pyast.Dict)
                for k in node.keys if isinstance(k, pyast.Constant)]
        dupes = {k for k in keys if keys.count(k) > 1}
        assert not dupes, f"{fname}() duplicate keys: {sorted(dupes)}"
