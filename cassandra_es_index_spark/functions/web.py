"""URL / web-domain helpers for LLM training-data pipelines — the
C4/RefinedWeb-style URL-filtering stage (extract URLs from document
text, reduce to a registrable domain, flag or drop documents whose
domains sit on a blocklist).

All pure Column algebra (regexp + array ops, whole-stage codegen);
the blocklist join broadcasts the (small) blocklist so the corpus
pass stays map-side — the only shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://... up to whitespace or common delimiters that end a URL in
# prose (quotes, angle brackets, closing paren/bracket)
URL_RE = r"""https?://[^\s<>"')\]]+"""


def extract_urls(col: Column) -> Column:
    """All http(s) URLs in a text column, in order (possibly empty).
    Trailing sentence punctuation (``http://a.org,`` in prose) is
    stripped — the classic extraction trap."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(URL_RE), 0),
        lambda u: F.regexp_replace(u, r"[.,;:!?]+$", ""))


def url_count(col: Column) -> Column:
    return F.size(extract_urls(col)).cast("long")


def url_host(url: Column) -> Column:
    """Lowercased host of one URL (strips scheme, path, query,
    fragment, port)."""
    return F.lower(F.regexp_extract(url, r"https?://([^/:?#]+)", 1))


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a host (``a.b.spam.example.com`` →
    ``example.com``) — the naive registrable-domain reduction.
    Documented subset: no public-suffix list (``example.co.uk`` →
    ``co.uk``); blocklists for multi-label suffixes should list the
    full host."""
    parts = F.split(host, r"\.")
    return F.when(
        F.size(parts) >= 2,
        F.concat_ws(".", F.element_at(parts, -2),
                    F.element_at(parts, -1))).otherwise(host)


def doc_domains(col: Column) -> Column:
    """Distinct registered domains linked from a text column."""
    return F.array_distinct(
        F.transform(extract_urls(col),
                    lambda u: registered_domain(url_host(u))))


def flag_blocklisted(df: DataFrame, id_cols: list[str], text_col: str,
                     blocklist: DataFrame, domain_col: str,
                     flag_col: str = "blocklisted") -> DataFrame:
    """Add a boolean ``flag_col``: does the document link to any
    blocklisted registered domain?

    Plan: the document's distinct domains explode (bounded by URLs per
    doc), left-semi against the BROADCAST blocklist, and the flagged
    key set left-joins back — the corpus is read once, the shuffle is
    bounded by the number of flagged documents, never the corpus.
    Exact match on the registered domain (lowercased both sides)."""
    hits = (df.select(*id_cols,
                      F.explode(doc_domains(F.col(text_col)))
                       .alias("_wf_dom"))
            .join(F.broadcast(blocklist.select(
                      F.lower(F.col(domain_col)).alias("_wf_dom"))
                  .distinct()),
                  on="_wf_dom", how="left_semi")
            .select(*id_cols).distinct()
            .withColumn(flag_col, F.lit(True)))
    return (df.join(hits, on=id_cols, how="left")
              .withColumn(flag_col,
                          F.coalesce(F.col(flag_col), F.lit(False))))
