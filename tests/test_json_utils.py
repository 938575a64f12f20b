"""Golden-vector tests for the pure JSON helpers.

Vectors come from the reference's own docs/tests:
- flatten: README.md:566-592
- dotted→structured: JsonUtilsTest.java:87-96
"""

import json

from cassandra_es_index_spark.functions import json_utils as ju

FLATTEN_SRC = """
{
     "maps": {
         "key1": "value",
         "key2": 42,
         "keymap": {
             "sss1": null,
             "sss2": 42,
             "sss0": "ffff"
         },
         "plap": "plop"
     },
     "string": "string",
     "int": 42,
     "plplpl": [1,2,3,4]
}
"""

FLATTEN_EXPECTED = {
    "maps": ["key1=value", "key2=42", "keymap={sss1=null, sss2=42, sss0=ffff}",
             "plap=plop"],
    "string": ["string"],
    "int": ["42"],
    "plplpl": ["1", "2", "3", "4"],
}


def test_flatten_reference_vector():
    assert json.loads(ju.flatten(FLATTEN_SRC)) == FLATTEN_EXPECTED


def test_flatten_scalars_and_bools():
    out = json.loads(ju.flatten('{"a": true, "b": null, "c": 1.5}'))
    assert out == {"a": ["true"], "b": ["null"], "c": ["1.5"]}


DOTTED_SRC = {
    "index.translog.durability": "async",
    "analysis.analyzer.email_analyzer.filter": "lowercase",
    "analysis.analyzer.html_analyzer.tokenizer": "ngram",
    "analysis.analyzer.email_analyzer.type": "pattern",
    "index.analysis.normalizer.lower_ascii_normalizer.filter": ["lowercase", "asciifolding"],
    "index.analysis.analyzer.lowercase_analyzer.filter": "lowercase",
    "index.analysis.analyzer.lowercase_analyzer.type": "custom",
    "analysis.analyzer.html_analyzer.type": "custom",
    "analysis.analyzer.html_analyzer.filter": "lowercase",
    "analysis.analyzer.html_analyzer.char_filter": "html_strip",
    "index.analysis.normalizer.lower_ascii_normalizer.type": "custom",
    "index.analysis.analyzer.lowercase_analyzer.tokenizer": "keyword",
}

DOTTED_EXPECTED = json.loads(
    '{"index":{"translog":{"durability":"async"},"analysis":{"normalizer":'
    '{"lower_ascii_normalizer":{"filter":["lowercase","asciifolding"],"type":"custom"}},'
    '"analyzer":{"lowercase_analyzer":{"filter":"lowercase","type":"custom",'
    '"tokenizer":"keyword"}}}},"analysis":{"analyzer":{"email_analyzer":'
    '{"filter":"lowercase","type":"pattern"},"html_analyzer":{"tokenizer":"ngram",'
    '"type":"custom","filter":"lowercase","char_filter":"html_strip"}}}}'
)


def test_dotted_to_structured_reference_vector():
    assert ju.dotted_to_structured(DOTTED_SRC) == DOTTED_EXPECTED


def test_path_helpers():
    obj = {"a": {"b": {"c": 1}}, "keep": "1"}
    assert ju.get_path(obj, "a", "b", "c") == 1
    assert ju.get_path(obj, "a", "x") is None
    assert ju.get_string(obj, "keep") == "1"
    assert ju.get_string(obj, "a", "b", "c") == "1"
    assert ju.filter_keys(obj, {"keep"}) == {"keep": "1"}
    filtered = ju.filter_path(obj, "a", "b")
    assert filtered == {"a": {}, "keep": "1"}
    assert obj["a"] == {"b": {"c": 1}}  # original untouched


def test_merge():
    base = {"a": {"x": 1, "y": 2}, "b": 1}
    extra = {"a": {"y": 3, "z": 4}, "c": 5}
    assert ju.merge(base, extra) == {"a": {"x": 1, "y": 3, "z": 4}, "b": 1, "c": 5}


def test_un_quote():
    assert ju.un_quote('"abc"') == "abc"
    assert ju.un_quote("abc") == "abc"
