"""Ingest pipelines (U1) + analyzer registry (U2) tests."""

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark import pipelines as P
from cassandra_es_index_spark.functions import analyzers as A


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("1", "Hello-World FOO", "<p>Caf&eacute; <b>Bar</b></p>")],
        "id string, title string, html string")


def test_pipeline_registry_and_processors(df):
    reg = P.PipelineRegistry()
    reg.put("clean", [
        P.lowercase_field("title"),
        P.gsub_field("title", "-", " "),
        P.set_field("indexed_by", "pipeline-clean"),
        P.rename_field("html", "raw_html"),
    ])
    out = reg.apply("clean", df)
    row = out.first()
    assert row["title"] == "hello world foo"
    assert row["indexed_by"] == "pipeline-clean"
    assert "raw_html" in out.columns and "html" not in out.columns


def test_pipeline_from_processor_specs(df):
    # the JSON shape ES ingest pipelines use (ref UpdatePipeline.java:30-67)
    procs = P.from_processor_specs([
        {"lowercase": {"field": "title"}},
        {"remove": {"field": "html"}},
        {"set": {"field": "v", "value": 2}},
    ])
    reg = P.PipelineRegistry()
    reg.put("spec", procs)
    out = reg.apply("spec", df)
    assert out.first()["title"] == "hello-world foo"
    assert "html" not in out.columns
    assert out.first()["v"] == 2


def test_pipeline_unknown_processor():
    with pytest.raises(ValueError):
        P.from_processor_specs([{"frobnicate": {"field": "x"}}])


def test_analyzers(df):
    out = df.select(
        A.analyze("standard", F.col("title")).alias("std"),
        A.analyze("keyword", F.col("title")).alias("kw"),
        A.analyze("dash", F.col("title")).alias("dash"),
        A.analyze("html", F.col("html")).alias("html"),
    ).first()
    assert out["std"] == ["hello", "world", "foo"]
    assert out["kw"] == ["Hello-World FOO"]
    assert out["dash"] == ["hello", "world foo"]
    assert out["html"] == ["caf", "bar"]


def test_analyzer_registry():
    A.register("upper", lambda c: F.array(F.upper(c)))
    assert "upper" in A.names()
    with pytest.raises(KeyError):
        A.get("nope")
