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
# prose (quotes, angle brackets, closing paren/bracket); schemes match
# case-insensitively (r14 — prose contains HTTP:// too; canonical_url
# lowercases them)
URL_RE = r"""(?i)https?://[^\s<>"')\]]+"""


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
    return F.lower(F.regexp_extract(url, r"(?i)https?://([^/:?#]+)", 1))


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


# query parameters that never change the resource — the public
# crawler/analytics tracking set (utm campaign tags, click ids,
# mailchimp/instagram ids, GA cookies, bare ref tags)
_TRACKING_PARAM_RE = (r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|"
                      r"mc_eid|igshid|ref|ref_src|_ga)(=.*)?$")


def canonical_url(url: Column) -> Column:
    """Canonical form of one http(s) URL — the crawl-dedup
    normalization (RFC 3986 case/port rules + tracking-param strip):

    - scheme and host lowercase; path case PRESERVED (case-sensitive
      by spec);
    - default ports dropped (``:80`` http, ``:443`` https); explicit
      non-default ports kept;
    - fragment dropped (never sent to the server);
    - tracking query params removed (``utm_*``, click ids, ``ref`` —
      the public analytics set), survivors SORTED so param order can't
      split duplicates; an emptied query drops its ``?``;
    - trailing path slashes stripped (root ``/`` included).

    Pure Column algebra (regexp decompose + array filter/sort), so it
    runs identically in the DuckDB oracle. Non-http(s) input → null
    (Column code can't raise typed errors per row; null is the
    documented contract, same as malformed-IP handling in ip_range)."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(_TRACKING_PARAM_RE)))
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    out = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(F.size(kept) > 0,
               F.concat(F.lit("?"), F.array_join(kept, "&")))
        .otherwise(""))
    return F.when(scheme.isin("http", "https") & (host != ""), out)


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
