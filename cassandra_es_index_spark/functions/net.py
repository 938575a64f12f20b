"""IPv4 column helpers for the ``ip_range`` / ``ip_prefix``
aggregations (the ES `ip` field type's agg surface; the reference
delegates both to ES, ref ElasticIndex.java:663-667).

Pure Column algebra — dotted-quad parsing is one regexp gate plus four
casts folded into a single long, rendering back is shift-and-mask
concat. Both stay inside whole-stage codegen; malformed strings (bad
shape or an octet > 255) become null, which every bucket kind already
drops (the ES convention for unindexable values, documented)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dotted quad, octets 0-255 (leading zeros accepted, like inet_aton)
_IPV4_RE = (r"^(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"
            r"(\.(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})){3}$")


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string → its 32-bit value as a long (null when the
    string is not a valid IPv4 address)."""
    parts = F.split(col, r"\.")
    num = (F.element_at(parts, 1).cast("long") * F.lit(16777216)
           + F.element_at(parts, 2).cast("long") * F.lit(65536)
           + F.element_at(parts, 3).cast("long") * F.lit(256)
           + F.element_at(parts, 4).cast("long"))
    return F.when(col.rlike(_IPV4_RE), num)


def long_to_ipv4(col: Column) -> Column:
    """32-bit long → dotted-quad string (the ip_prefix bucket key)."""
    return F.concat_ws(
        ".",
        (col / F.lit(16777216)).cast("long") % F.lit(256),
        (col / F.lit(65536)).cast("long") % F.lit(256),
        (col / F.lit(256)).cast("long") % F.lit(256),
        col % F.lit(256))
