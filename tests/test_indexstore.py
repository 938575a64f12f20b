"""Index-store lifecycle tests: build, upsert, TTL, segments, truncate
(ref DefaultIndexManager / IndexDropManager semantics)."""

import datetime

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.docmodel import DOC_ID, INT_MAX
from cassandra_es_index_spark.indexstore import ParquetIndexStore


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture()
def base(spark):
    rows = [
        ("a", "hello cassandra", 42, _ts(1), None),
        ("b", "hello elastic", 10, _ts(1, 12), None),
        ("c", "goodbye world", 7, _ts(2), 1_700_000_000),
    ]
    return spark.createDataFrame(
        rows, "id string, body string, userid int, created timestamp, expire_at long")


def _store(spark, tmp_path, base_spec_options=None, event_time_col=None):
    spec = TableSpec("emails", ["id"], ttl_column="expire_at",
                     options=base_spec_options or {})
    return ParquetIndexStore(spark, str(tmp_path / "idx"), spec,
                             event_time_col=event_time_col)


def test_build_and_read(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    assert store.count() == 3
    got = {r[DOC_ID]: r["_cassandraTtl"] for r in store.read().collect()}
    assert got["a"] == INT_MAX
    assert got["c"] == 1_700_000_000


def test_day_segmentation(spark, tmp_path, base):
    store = _store(spark, tmp_path,
                   {"index-segment": "DAY"}, event_time_col="created")
    store.build(base)
    segs = {r["segment"] for r in store.read().select("segment").distinct().collect()}
    assert segs == {"2024-01-01", "2024-01-02"}


def test_frame_segmentation_and_retention(spark, tmp_path, base):
    day_ms = 86_400_000
    store = _store(spark, tmp_path,
                   {"index-segment": "FRAME", "segment-size": day_ms},
                   event_time_col="created")
    store.build(base)
    segs = {r["segment"] for r in store.read().select("segment").distinct().collect()}
    assert len(segs) == 2
    # retention horizon after day 2 → day-1 segment is expired
    now_ms = int(_ts(3).replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    expired = store.expired_segments(now_ms, retention_ms=day_ms)
    assert len(expired) == 1
    store.drop_segments(expired)
    assert store.count() == 1  # only the day-2 doc remains


def test_upsert_merges_by_id(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    patch = spark.createDataFrame(
        [("a", "hello UPDATED", 99, _ts(1), None),
         ("d", "brand new", 1, _ts(3), None)],
        "id string, body string, userid int, created timestamp, expire_at long")
    store.upsert(patch)
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got == {"a": "hello UPDATED", "b": "hello elastic",
                   "c": "goodbye world", "d": "brand new"}


def test_upsert_rewrites_only_touched_segments(spark, tmp_path, base):
    store = _store(spark, tmp_path,
                   {"index-segment": "DAY"}, event_time_col="created")
    store.build(base)
    import os
    seg2 = str(tmp_path / "idx" / "segment=2024-01-02")
    before = {f: os.path.getmtime(os.path.join(seg2, f))
              for f in os.listdir(seg2)}
    patch = spark.createDataFrame(
        [("a", "updated", 99, _ts(1), None)],
        "id string, body string, userid int, created timestamp, expire_at long")
    store.upsert(patch)
    after = {f: os.path.getmtime(os.path.join(seg2, f))
             for f in os.listdir(seg2)}
    assert before == after  # untouched segment not rewritten
    assert store.count() == 3


def test_delete_ids_and_missing_is_noop(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    ids = spark.createDataFrame([("a",), ("zzz",)], f"{DOC_ID} string")
    store.delete_ids(ids)
    assert {r[DOC_ID] for r in store.read().collect()} == {"b", "c"}


def test_ttl_sweep(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    store.delete_expired(now_epoch_s=1_700_000_001)
    assert {r[DOC_ID] for r in store.read().collect()} == {"a", "b"}
    # ttl-shift delays expiry (ref IndexConfig.java:128-129)
    store2 = _store(spark, tmp_path / "s2", {"ttl-shift": 3600})
    store2.spec.ttl_column = "expire_at"
    store2.build(base)
    store2.delete_expired(now_epoch_s=1_700_000_001)
    assert store2.count() == 3  # shifted past the sweep time


def test_truncate_and_drop(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    store.truncate()
    assert store.count() == 0
    store.build(base)
    store.drop()
    assert not store.exists()


def test_purge_empty_segments(spark, tmp_path, base):
    store = _store(spark, tmp_path,
                   {"index-segment": "DAY"}, event_time_col="created")
    store.build(base)
    # delete all docs of day 1 → purge drops that segment directory
    ids = spark.createDataFrame([("a",), ("b",)], f"{DOC_ID} string")
    store.delete_ids(ids)
    dropped = store.purge_empty_segments()
    assert dropped == ["2024-01-01"] or dropped == []  # empty seg may already be gone
    segs = {r["segment"] for r in store.read().select("segment").distinct().collect()}
    assert segs == {"2024-01-02"}


# -- merge-on-read upsert properties ----------------------------------------


def _file_state(root):
    """{relative_path: (size, mtime)} for every parquet file under root."""
    import os
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_upsert_appends_o_batch_not_o_segment(spark, tmp_path, base):
    """VERDICT r1 item 5: untouched files stay byte-identical and the
    write is O(batch), not O(segment)."""
    store = _store(spark, tmp_path)
    store.build(base)
    root = str(tmp_path / "idx")
    before = _file_state(root)
    total_before = sum(sz for sz, _ in before.values())
    patch = spark.createDataFrame(
        [("a", "tiny update", 99, _ts(1), None)],
        "id string, body string, userid int, created timestamp, expire_at long")
    store.upsert(patch)
    after = _file_state(root)
    # every pre-existing file untouched (size AND mtime identical)
    for path, sig in before.items():
        assert after[path] == sig, f"rewrote {path}"
    # written bytes bounded by the batch, not the segment
    new_bytes = sum(sz for p, (sz, _) in after.items() if p not in before)
    assert 0 < new_bytes < max(total_before, 20_000)
    # and the logical view still merges correctly
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got["a"] == "tiny update" and len(got) == 3


def test_upsert_shadows_cross_segment_move(spark, tmp_path, base):
    """A document whose event time (and so segment) changes must hide its
    stale copy in the old segment (ADVICE r1, indexstore item)."""
    store = _store(spark, tmp_path,
                   {"index-segment": "DAY"}, event_time_col="created")
    store.build(base)
    moved = spark.createDataFrame(
        [("a", "moved to day 5", 42, _ts(5), None)],
        "id string, body string, userid int, created timestamp, expire_at long")
    store.upsert(moved)
    rows = {r[DOC_ID]: (r["body"], r["segment"]) for r in store.read().collect()}
    assert rows["a"] == ("moved to day 5", "2024-01-05")
    assert len(rows) == 3  # no duplicate _id from the stale day-1 copy
    # compaction physically removes the stale copy and the delta
    store.compact_deltas()
    assert store.delta_stats()["gen"] == 0
    rows2 = {r[DOC_ID]: r["segment"] for r in store.read().collect()}
    assert rows2["a"] == "2024-01-05" and len(rows2) == 3


def test_delete_is_tombstone_append_then_compact(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    root = str(tmp_path / "idx")
    before = _file_state(root)
    ids = spark.createDataFrame([("b",)], f"{DOC_ID} string")
    store.delete_ids(ids)
    after = _file_state(root)
    for path, sig in before.items():
        assert after[path] == sig  # delete did not rewrite data files
    assert {r[DOC_ID] for r in store.read().collect()} == {"a", "c"}
    assert store.delta_stats()["tombstones"] == 1
    store.compact_deltas()
    assert store.delta_stats() == {"gen": 0, "delta_rows": 0, "tombstones": 0}
    assert {r[DOC_ID] for r in store.read().collect()} == {"a", "c"}


def test_last_delta_generation_wins(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    for i in range(3):
        patch = spark.createDataFrame(
            [("a", f"v{i}", i, _ts(1), None)],
            "id string, body string, userid int, created timestamp, expire_at long")
        store.upsert(patch)
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got["a"] == "v2"
    # resurrection check: delete then re-upsert
    store.delete_ids(spark.createDataFrame([("a",)], f"{DOC_ID} string"))
    assert "a" not in {r[DOC_ID] for r in store.read().collect()}
    patch = spark.createDataFrame(
        [("a", "reborn", 1, _ts(1), None)],
        "id string, body string, userid int, created timestamp, expire_at long")
    store.upsert(patch)
    assert {r[DOC_ID]: r["body"] for r in store.read().collect()}["a"] == "reborn"


def test_autocompact_bounds_generations(spark, tmp_path, base):
    spec_opts = {"delta-compact-gens": 3}
    store = _store(spark, tmp_path, spec_opts)
    store.build(base)
    for i in range(4):
        patch = spark.createDataFrame(
            [("a", f"v{i}", i, _ts(1), None)],
            "id string, body string, userid int, created timestamp, expire_at long")
        store.upsert(patch)
    assert store.delta_stats()["gen"] < 3  # folded along the way
    assert {r[DOC_ID]: r["body"] for r in store.read().collect()}["a"] == "v3"


def test_upsert_batch_duplicate_ids_deterministic(spark, tmp_path, base):
    """Duplicate _ids within one batch share a generation: the store must
    pick a deterministic winner that survives reads AND compaction
    unchanged (ADVICE r2: row_number over _gen alone was nondeterministic)."""
    store = _store(spark, tmp_path)
    store.build(base)
    dup = spark.createDataFrame(
        [("b", "version one", 1, _ts(3), None),
         ("b", "version two", 2, _ts(3), None)],
        "id string, body string, userid int, created timestamp, expire_at long")
    store.upsert(dup)
    first_read = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    second_read = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert first_read == second_read
    store.compact_deltas()
    after_compact = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert after_compact == first_read
    # exactly one surviving row for the duplicated id
    assert store.read().where(F.col(DOC_ID) == "b").count() == 1


def test_upsert_schema_mismatch_fails_fast(spark, tmp_path, base):
    """A batch whose schema diverges from the store must be rejected, not
    silently written with columns dropped at read time (ADVICE r2)."""
    store = _store(spark, tmp_path)
    store.build(base)
    bad = spark.createDataFrame(
        [("z", "text", 1, _ts(3), None, "extra")],
        "id string, body string, userid int, created timestamp, "
        "expire_at long, surprise string")
    with pytest.raises(ValueError, match="schema mismatch"):
        store.upsert(bad)
    assert store.count() == 3  # nothing was appended


# -- reindex / update_by_query (r12) --------------------------------------


def test_reindex_match_set_into_store(spark, tmp_path, base):
    from cassandra_es_index_spark.search.engine import SearchEngine
    eng = SearchEngine(spark)
    eng.register(base, TableSpec("emails", ["id"]))
    dest = _store(spark, tmp_path)
    dest.build(base.limit(0))
    n = eng.reindex("emails", dest, "body:hello",
                    default_field="body")
    assert n == 2
    got = sorted(r["id"] for r in dest.read().collect())
    assert got == ["a", "b"]
    # no query = the whole table (upsert dedups by key)
    assert eng.reindex("emails", dest) == 3
    assert dest.count() == 3


def test_reindex_with_pipeline_and_registry_guard(spark, tmp_path,
                                                  base):
    from cassandra_es_index_spark import pipelines as P
    from cassandra_es_index_spark.search.engine import SearchEngine
    from cassandra_es_index_spark.search.es_dsl import DslError
    eng = SearchEngine(spark)
    eng.register(base, TableSpec("emails", ["id"]))
    dest = _store(spark, tmp_path)
    dest.build(base.limit(0))
    reg = P.PipelineRegistry()
    reg.put("up", [P.lowercase_field("body")])
    n = eng.reindex("emails", dest, "body:CASSANDRA",
                    pipeline="up", registry=reg, default_field="body")
    assert n == 1
    assert dest.read().collect()[0]["body"] == "hello cassandra"
    with pytest.raises(DslError, match="PipelineRegistry"):
        eng.reindex("emails", dest, None, pipeline="up")


def test_update_by_query_last_writer_wins(spark, tmp_path, base):
    from cassandra_es_index_spark import pipelines as P
    from cassandra_es_index_spark.search.engine import SearchEngine
    eng = SearchEngine(spark)
    eng.register(base, TableSpec("emails", ["id"]))
    store = _store(spark, tmp_path)
    store.build(base)
    reg = P.PipelineRegistry()
    reg.put("flag", [P.set_field("userid", 999)])
    n = eng.update_by_query("emails", store, "body:hello",
                            pipeline="flag", registry=reg,
                            default_field="body")
    assert n == 2
    rows = {r["id"]: r["userid"] for r in store.read().collect()}
    # matched rows updated in the store, the non-match untouched
    assert rows == {"a": 999, "b": 999, "c": 7}


# -- ES _bulk surface (r13) --------------------------------------------------


def test_bulk_index_create_update_delete(spark, tmp_path, base):
    import json

    store = _store(spark, tmp_path)
    store.build(base)

    def act(action, meta=None):
        return json.dumps({action: meta or {}})

    nd = "\n".join([
        # index new doc d → created
        act("index"),
        json.dumps({"id": "d", "body": "new doc", "userid": 5,
                    "created": None, "expire_at": None}),
        # index existing a → updated (replace)
        act("index"),
        json.dumps({"id": "a", "body": "replaced", "userid": 42,
                    "created": None, "expire_at": None}),
        # create existing b → 409 error, no write
        act("create"),
        json.dumps({"id": "b", "body": "conflict", "userid": 10,
                    "created": None, "expire_at": None}),
        # partial update c: only body changes, userid stays 7
        act("update", {"_id": "c"}),
        json.dumps({"doc": {"body": "patched"}}),
        # update missing → 404 item
        act("update", {"_id": "zz"}),
        json.dumps({"doc": {"body": "x"}}),
        # delete b → deleted; delete zz → not_found
        act("delete", {"_id": "b"}),
        act("delete", {"_id": "zz"}),
    ])
    res = store.bulk(nd)
    assert [r.get("result", r.get("error"))[:7] for r in res] == [
        "created", "updated", "version", "updated", "documen",
        "deleted", "not_fou"]
    assert [r["status"] for r in res] == [201, 200, 409, 200, 404,
                                          200, 404]
    rows = {r[DOC_ID]: (r["body"], r["userid"])
            for r in store.read().collect()}
    assert set(rows) == {"a", "c", "d"}          # b deleted
    assert rows["a"] == ("replaced", 42)
    assert rows["c"] == ("patched", 7)           # partial merge
    assert rows["d"] == ("new doc", 5)


def test_bulk_order_within_batch(spark, tmp_path, base):
    import json

    store = _store(spark, tmp_path)
    store.build(base)
    # delete a then re-index a: last action wins → a exists (new body);
    # index e then delete e: e absent; create-after-index conflicts
    nd = "\n".join([
        json.dumps({"delete": {"_id": "a"}}),
        json.dumps({"index": {}}),
        json.dumps({"id": "a", "body": "reborn", "userid": 1,
                    "created": None, "expire_at": None}),
        json.dumps({"index": {}}),
        json.dumps({"id": "e", "body": "temp", "userid": 2,
                    "created": None, "expire_at": None}),
        json.dumps({"delete": {"_id": "e"}}),
        json.dumps({"create": {}}),
        json.dumps({"id": "a", "body": "again", "userid": 3,
                    "created": None, "expire_at": None}),
    ])
    res = store.bulk(nd)
    assert res[0]["result"] == "deleted"
    assert res[1]["result"] == "created"     # a was deleted just before
    assert res[3]["result"] == "deleted"
    assert res[4]["status"] == 409           # create on live a
    rows = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert rows["a"] == "reborn" and "e" not in rows


def test_bulk_update_merges_onto_falsy_in_batch_state(spark, tmp_path):
    """An update must merge onto the IN-BATCH state even when that
    state is an empty/all-falsy source dict (r13 ADVICE: a truthiness
    fallback `state.get(did) or existing_src...` silently merged onto
    the STALE store row instead). An empty-source index derives doc id
    '' from the null key, so the store is seeded with an ''-keyed doc
    carrying a stale userid the update must NOT resurrect."""
    import json

    store = _store(spark, tmp_path)
    store.build(spark.createDataFrame(
        [("", "stale body", 42, _ts(1), None)],
        "id string, body string, userid int, created timestamp, "
        "expire_at long"))
    nd = "\n".join([
        json.dumps({"index": {}}),
        json.dumps({}),                      # in-batch state for '' = {}
        json.dumps({"update": {"_id": ""}}),
        json.dumps({"doc": {"body": "patched"}}),
    ])
    res = store.bulk(nd)
    # the '' doc is live, so index reports updated(200), then update 200
    assert [r["status"] for r in res] == [200, 200]
    (row,) = store.read().collect()
    assert row["body"] == "patched"
    # the stale store source must not leak through the falsy in-batch
    # state: the index action reset userid to null
    assert row["userid"] is None


def test_bulk_typed_errors(spark, tmp_path, base):
    import json

    store = _store(spark, tmp_path)
    store.build(base)
    with pytest.raises(ValueError, match="unknown action"):
        store.bulk(json.dumps({"upsertish": {}}))
    with pytest.raises(ValueError, match="missing its source"):
        store.bulk(json.dumps({"index": {}}))
    with pytest.raises(ValueError, match="doc"):
        store.bulk("\n".join([
            json.dumps({"update": {"_id": "a"}}),
            json.dumps({"script": "ctx..."}),
        ]))
    with pytest.raises(ValueError, match="unknown source fields"):
        store.bulk("\n".join([
            json.dumps({"index": {}}),
            json.dumps({"id": "x", "nope": 1}),
        ]))
    with pytest.raises(ValueError, match="contradicts"):
        store.bulk("\n".join([
            json.dumps({"index": {"_id": "WRONG"}}),
            json.dumps({"id": "x", "body": "b", "userid": 1,
                        "created": None, "expire_at": None}),
        ]))
    with pytest.raises(ValueError, match="needs an '_id'"):
        store.bulk(json.dumps({"delete": {}}))
    with pytest.raises(ValueError, match="malformed JSON"):
        store.bulk("{not json")


def test_snapshot_and_restore_point_in_time(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    store.build(base)
    upd = spark.createDataFrame(
        [("a", "updated body", 1, _ts(3), None)], base.schema)
    store.upsert(upd)
    snap = str(tmp_path / "snap1")
    info = store.snapshot(snap)
    assert info["files"] > 0 and info["gen"] >= 1

    # mutate past the snapshot: another update + a delete
    store.upsert(spark.createDataFrame(
        [("b", "post-snapshot body", 2, _ts(4), None)], base.schema))
    store.delete_ids(spark.createDataFrame([("c",)], f"{DOC_ID} string"))
    assert store.count() == 2
    post = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert post["b"] == "post-snapshot body"

    # restore rewinds to the snapshot state exactly
    store.restore(snap, overwrite=True)
    assert store.count() == 3
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got["a"] == "updated body"
    assert got["b"] == "hello elastic"
    assert "c" in got


def test_snapshot_restore_typed_errors(spark, tmp_path, base):
    store = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="nothing to snapshot"):
        store.snapshot(str(tmp_path / "s0"))
    store.build(base)
    snap = str(tmp_path / "snap")
    store.snapshot(snap)
    with pytest.raises(ValueError, match="already exists"):
        store.snapshot(snap)
    with pytest.raises(ValueError, match="overwrite=True"):
        store.restore(snap)
    bad = tmp_path / "not_a_snapshot"
    bad.mkdir()
    with pytest.raises(ValueError, match="not an index-store snapshot"):
        store.restore(str(bad), overwrite=True)


def test_upsert_missing_key_and_bad_delete_predicate_typed(
        spark, tmp_path, base):
    # r14.75 store-fuzz catches: both previously escaped as
    # unresolved-column AnalysisExceptions
    store = _store(spark, tmp_path)
    store.build(base)
    with pytest.raises(ValueError, match="missing\\s+key column"):
        store.upsert(spark.createDataFrame([("x",)], "subject string"))
    with pytest.raises(ValueError, match="does not resolve"):
        store.delete_where(F.col("zzz") > 1)
    # the store is untouched by the rejected writes
    assert store.count() == base.count()
