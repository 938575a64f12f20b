"""Row → document transformation (SURVEY.md §1, ref ElasticIndex.java:470-586).

The reference converts every Cassandra row into a JSON document:

- doc id  = primary-key values joined by a separator
            (ref CStarUtils.java:376-406, IndexConfig.java:42)
- every scalar serialized to its string form; timestamps to ISO-8601 GMT
  with millisecond precision (ref CStarUtils.java:186-313, JsonUtils.java:49)
- string columns listed in ``json-serialized-fields`` embedded as raw JSON
  (ref ElasticIndex.java:512-514); those in ``json-flat-serialized-fields``
  flattened to ``map<string, array<string>>`` (ref JsonUtils.java:81-116)
- engine fields appended: ``IndexationDate`` (index time) and
  ``_cassandraTtl`` (epoch-seconds expiry; Integer.MAX_VALUE when no TTL)
  (ref ElasticIndex.java:576-582)
- ``discard-nulls``: dead cells skipped (default) or written as explicit
  nulls so fields can be erased (ref ElasticIndex.java:525-527)

The Spark build keeps columns **typed** (an upgrade over row→JSON: parquet
scans stay columnar, predicates push down) and offers ``doc_json`` for the
exact string-serialized document when parity output is wanted. All
transforms are built-in Column expressions — no Python in the hot path, so
the whole map stays inside WholeStageCodegen at any scale.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_es_index_spark.catalog import TableSpec

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"  # ref JsonUtils.java:49 (GMT)
INT_MAX = 2_147_483_647  # no-TTL sentinel, ref README.md:272,305
TTL_FIELD = "_cassandraTtl"
INDEXATION_FIELD = "IndexationDate"
# The document identity column. Named like the ES `_id` (the reference's doc
# id is the URL path component, not a document field — ElasticIndex.java:605)
# so it cannot collide with ordinary source columns.
DOC_ID = "_id"


def iso8601(col: Column) -> Column:
    """ISO-8601 GMT millisecond format (ref JsonUtils.java:122-126).

    Session timezone is pinned UTC by ``session.get_spark``, matching the
    reference's explicit GMT formatter.
    """
    return F.date_format(col, ISO_FMT)


def doc_id_column(spec: TableSpec) -> Column:
    """``PK[-PK][-CK…]`` doc-id synthesis (ref CStarUtils.java:376-406)."""
    sep = spec.config().id_separator
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in spec.key_columns])


def stringify(col: Column, dtype: T.DataType) -> Column:
    """The reference's per-type string serialization
    (ref CStarUtils.byteBufferToString, CStarUtils.java:186-313).

    Timestamps → ISO-8601 GMT; booleans → true/false; collections/structs →
    JSON; binary → ``"<N> bytes"`` placeholder (blobs are never indexed,
    ref CStarUtils.java:305-306); everything else → plain string form.
    """
    if isinstance(dtype, T.TimestampType):
        return iso8601(col)
    if isinstance(dtype, T.BinaryType):
        return F.concat(F.length(col).cast("string"), F.lit(" bytes"))
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(col)
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("true")).when(~col, F.lit("false"))
    return col.cast("string")


# ES mapping field types → Spark cast targets (the subset the reference's
# README mappings use; ref README.md:317-400, IndexConfig.java:97).
_ES_TYPE_TO_SPARK = {
    "keyword": "string",
    "text": "string",
    "long": "long",
    "integer": "int",
    "short": "short",
    "byte": "tinyint",
    "double": "double",
    "float": "float",
    "half_float": "float",
    "boolean": "boolean",
    "date": "timestamp",
}


def mapping_casts(spec: TableSpec) -> dict[str, str]:
    """Static field-type overrides from a user-supplied ES mapping.

    The reference applies ``mapping-<type>`` JSON at index creation so
    field types are declared, not inferred (ref IndexConfig.java:97,
    README.md:317-400). Here the same option (``mapping-<table>`` or plain
    ``mapping``; JSON string or dict) yields a {column: spark-type} cast
    map applied by ``build_documents``.
    """
    raw = spec.options.get(f"mapping-{spec.name}", spec.options.get("mapping"))
    if not raw:
        return {}
    obj = json.loads(raw) if isinstance(raw, str) else raw
    props = obj.get("properties")
    if props is None and len(obj) == 1:
        # ES 6-style wrapper: {"<type>": {"properties": {...}}}
        inner = next(iter(obj.values()))
        props = inner.get("properties") if isinstance(inner, dict) else None
    out: dict[str, str] = {}
    for fname, fdef in (props or {}).items():
        es_type = fdef.get("type") if isinstance(fdef, dict) else None
        if es_type in _ES_TYPE_TO_SPARK:
            out[fname] = _ES_TYPE_TO_SPARK[es_type]
    return out


def ttl_column(spec: TableSpec) -> Column:
    """``_cassandraTtl`` epoch-seconds with ttl-shift applied; INT_MAX when
    the row has no expiry (ref ElasticIndex.java:580-582, ttl source
    EsSecondaryIndex.java:237, shift IndexConfig.java:128-129)."""
    shift = spec.config().ttl_shift
    if spec.ttl_column is None:
        return F.lit(INT_MAX).cast("long")
    raw = F.col(spec.ttl_column).cast("long")
    return F.coalesce(raw + F.lit(shift), F.lit(INT_MAX).cast("long"))


def build_documents(df: DataFrame, spec: TableSpec,
                    indexation_ts: Column | None = None) -> DataFrame:
    """Base table → index documents DataFrame.

    Output layout: ``doc_id`` first, then the typed source columns (json
    fields parsed/flattened per options), then ``IndexationDate`` +
    ``_cassandraTtl`` — same field order as the reference's JSON writer
    (ref ElasticIndex.java:470-586).
    """
    cfg = spec.config()
    json_fields = set(cfg.json_serialized_fields)
    flat_fields = set(cfg.json_flat_serialized_fields)
    casts = mapping_casts(spec)

    if DOC_ID in df.columns:
        raise ValueError(
            f"source column {DOC_ID!r} collides with the engine doc-id field")
    cols: list[Column] = [doc_id_column(spec).alias(DOC_ID)]
    for f_def in df.schema.fields:
        name = f_def.name
        if name in json_fields:
            # Raw-JSON embedding: parse to a queryable structure so
            # ``col.key:value`` predicates compile to struct access
            # (ref ElasticIndex.java:512-514, README.md:539).
            cols.append(json_field_column(name).alias(name))
        elif name in flat_fields:
            cols.append(flat_field_column(name).alias(name))
        elif name in casts:
            # static mapping override: declared type beats inferred
            cols.append(F.col(name).cast(casts[name]).alias(name))
        else:
            cols.append(F.col(name))
    ts = indexation_ts if indexation_ts is not None else F.current_timestamp()
    cols.append(iso8601(ts).alias(INDEXATION_FIELD))
    cols.append(ttl_column(spec).alias(TTL_FIELD))
    return df.select(*cols)


def json_field_column(name: str) -> Column:
    """``json-serialized-fields`` member → ``map<string,string>`` of the
    top-level object, JSON-encoded values preserved for nested access."""
    # variant type would be ideal; map<string,string> keeps heterogeneous
    # objects queryable (value re-parsed on demand by the search compiler).
    return F.from_json(F.col(name), T.MapType(T.StringType(), T.StringType()))


def flat_field_column(name: str) -> Column:
    """``json-flat-serialized-fields`` member → ``map<string,array<string>>``.

    Spark-side equivalent of JsonUtils.flatten (ref JsonUtils.java:81-116):
    heterogeneous JSON values survive as string arrays; sub-maps become
    ``"k=v"`` strings so ``field:key=value`` search works
    (ref README.md:539-540). Exact parity with the Java string forms is
    guaranteed by the pure-Python ``functions.json_utils.flatten`` (golden
    tested); this column version uses it as a vectorless fallback only when
    structural functions can't express a case — here we can stay built-in
    for maps-of-scalars via from_json of three candidate shapes.
    """
    as_map_any = F.from_json(F.col(name), T.MapType(T.StringType(), T.StringType()))
    # For each top-level entry, the flattened value array:
    #  - entry parses as object      → its "k=v" pairs
    #  - entry parses as array       → element strings
    #  - otherwise                   → [scalar string]
    def _entry_value(v: Column) -> Column:
        sub = F.from_json(v, T.MapType(T.StringType(), T.StringType()))
        arr = F.from_json(v, T.ArrayType(T.StringType()))
        return (
            F.when(sub.isNotNull(),
                   F.transform(F.map_entries(sub),
                               lambda e: F.concat_ws("=",
                                                     e.getField("key"),
                                                     F.coalesce(e.getField("value"), F.lit("null")))))
            .when(arr.isNotNull(), arr)
            .otherwise(F.array(v))
        )

    return F.map_from_arrays(
        F.map_keys(as_map_any),
        F.transform(F.map_values(as_map_any), _entry_value),
    )


def base_rows_view(docs: DataFrame, base: DataFrame) -> DataFrame | None:
    """Project a documents DataFrame back onto the base table's schema —
    used after mutations so J1 row loading can serve documents that exist
    in the index but not in the registered base snapshot (the reference
    loads such rows from Cassandra, which holds the write).

    Returns None when a base column cannot be reconstructed (it was not
    carried into the documents), in which case the caller keeps the plain
    base side."""
    doc_types = {f.name: f.dataType for f in docs.schema.fields}
    cols: list[Column] = []
    for f in base.schema.fields:
        if f.name not in doc_types:
            return None
        if doc_types[f.name] == f.dataType:
            cols.append(F.col(f.name))
        elif isinstance(f.dataType, T.StringType):
            # json-parsed / mapped columns serialize back to their string form
            cols.append(stringify(F.col(f.name), doc_types[f.name]).alias(f.name))
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return docs.select(*cols)


def doc_json(docs: DataFrame, spec: TableSpec) -> DataFrame:
    """Serialize documents to the reference's JSON string form:
    ``(doc_id, doc)`` where every field is string-ified per §1.2.

    ``discard-nulls`` (default true) controls dead-cell handling exactly as
    in the reference (ref ElasticIndex.java:525-527, IndexConfig.java:73-74):
    true → null fields are omitted from the document (cells skipped);
    false → nulls are written explicitly so fields can be erased downstream.
    Spark's ``to_json`` ``ignoreNullFields`` option is precisely this
    switch.
    """
    fields = []
    for f_def in docs.schema.fields:
        if f_def.name == DOC_ID:
            continue
        fields.append(stringify(F.col(f_def.name), f_def.dataType).alias(f_def.name))
    ignore_nulls = "true" if spec.config().discard_nulls else "false"
    return docs.select(
        F.col(DOC_ID),
        F.to_json(F.struct(*fields),
                  {"ignoreNullFields": ignore_nulls}).alias("doc"))
