"""ES date-math evaluation for range bounds (``now-7d/d``,
``2024-01-01||+1M/d``).

The reference forwards any DSL to ES (ref ElasticIndex.java:658-667), so
date-math in ``range`` / ``date_range`` bounds is part of its query
surface — and it is the single most common idiom in real dashboard
queries (every "last 7 days" panel). Grammar (ES "Date Math"):

- anchor: ``now``, or a concrete date string followed by ``||``
- operations, applied left to right: ``+Nu`` / ``-Nu`` arithmetic and
  ``/u`` rounding, units ``y M w d h H m s`` (``w`` rounds to Monday,
  month arithmetic clamps the day like ES/Joda: Jan 31 + 1M = Feb 28)

Rounding direction depends on the comparison the bound sits in (ES
contract): ``gte``/``lt``/``from``/``to`` round DOWN to the unit start;
``gt``/``lte`` round UP — evaluated here as the start of the NEXT unit,
so the engine rewrites the operator instead of subtracting a
millisecond (``gt X/M`` → ``gte next-month-start``, ``lte X/M`` →
``lt next-month-start``): exact at any timestamp precision, and the
same concrete bound lands in both the scan predicate and the range
index filter.

``now`` is injectable (``#options:now=…#`` or ``SearchEngine.now``) so
query results — and the driver's DuckDB oracles — stay deterministic;
without injection it is the wall-clock UTC instant, captured once per
request so every bound in one query shares the same ``now``.

Evaluation happens driver-side at request-rewrite time (a few bounds
per query — never per row); the executors only ever see concrete
timestamp literals, which keep pushing down into parquet scans.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_ANCHOR_NOW = "now"
_OP_RE = re.compile(r"([+-]\d+[yMwdhHms]|/[yMwdhHms])")
_UNIT_DAYS = {"w": 7, "d": 1}
_UNIT_SECONDS = {"h": 3600, "H": 3600, "m": 60, "s": 1}


class DateMathError(ValueError):
    """Malformed date-math expression (reported as a DslError upstream)."""


def is_date_math(raw: object) -> bool:
    """Whether a range bound is a date-math expression: anchored at
    ``now`` or carrying the ``||`` separator. Plain date strings are NOT
    date-math (they flow through the ordinary typed-literal cast)."""
    return isinstance(raw, str) and (
        raw == _ANCHOR_NOW or raw.startswith(_ANCHOR_NOW + "+")
        or raw.startswith(_ANCHOR_NOW + "-")
        or raw.startswith(_ANCHOR_NOW + "/") or "||" in raw)


def utcnow() -> datetime:
    """The default anchor: current UTC wall-clock, naive (the engine's
    session timezone is pinned UTC)."""
    return datetime.now(timezone.utc).replace(tzinfo=None)


def parse_now(raw: str) -> datetime:
    """Parse an injected ``now`` option (ISO-8601; trailing ``Z`` ok)."""
    try:
        return datetime.fromisoformat(raw.replace("Z", "")
                                      .replace("T", " "))
    except ValueError as e:
        raise DateMathError(f"bad injected now {raw!r}: {e}") from e


def _add_months(dt: datetime, n: int) -> datetime:
    month0 = dt.year * 12 + (dt.month - 1) + n
    year, month = divmod(month0, 12)
    month += 1
    # clamp the day to the target month's length (Joda/ES semantics)
    for day in (dt.day, 30, 29, 28):
        try:
            return dt.replace(year=year, month=month, day=day)
        except ValueError:
            continue
    raise DateMathError(f"month arithmetic failed on {dt}")  # pragma: no cover


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":  # ES rounds weeks to Monday
        start = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return start - timedelta(days=start.weekday())
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    return dt.replace(microsecond=0)  # "s"


def _step(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "y":
        return _add_months(dt, 12 * n)
    if unit == "M":
        return _add_months(dt, n)
    if unit in _UNIT_DAYS:
        return dt + timedelta(days=n * _UNIT_DAYS[unit])
    return dt + timedelta(seconds=n * _UNIT_SECONDS[unit])


def resolve(expr: str, now: datetime, round_up: bool = False) -> datetime:
    """Evaluate a date-math expression to a concrete datetime.

    ``round_up``: a ``/u`` rounding yields the start of the NEXT unit
    instead of the unit start — the caller rewrites the comparison
    operator accordingly (see module docstring), so no sub-second
    fudge factors appear anywhere."""
    if "||" in expr:
        anchor_raw, _, ops = expr.partition("||")
        try:
            anchor = datetime.fromisoformat(
                anchor_raw.replace("Z", "").replace("T", " "))
        except ValueError as e:
            raise DateMathError(
                f"bad date-math anchor {anchor_raw!r}") from e
    elif expr.startswith(_ANCHOR_NOW):
        anchor, ops = now, expr[len(_ANCHOR_NOW):]
    else:
        raise DateMathError(f"not a date-math expression: {expr!r}")
    pos = 0
    dt = anchor
    for m in _OP_RE.finditer(ops):
        if m.start() != pos:
            raise DateMathError(f"bad date-math ops in {expr!r}")
        pos = m.end()
        tok = m.group(1)
        if tok.startswith("/"):
            unit = tok[1]
            down = _round_down(dt, unit)
            dt = _step(down, 1, unit) if round_up else down
        else:
            dt = _step(dt, int(tok[:-1]), tok[-1])
    if pos != len(ops):
        raise DateMathError(f"bad date-math ops in {expr!r}")
    return dt


# ES `format` (Java DateTimeFormatter patterns) → strftime, the subset
# real date_range requests use: year/month/day/hour/minute/second/
# millis tokens, common literal separators, and single-quoted literals
# ('T'). Week/era/zone tokens typed-reject — a silently mis-rendered
# bucket key is a wrong answer.
_FMT_TOKENS = {"yyyy": "%Y", "MM": "%m", "dd": "%d", "HH": "%H",
               "mm": "%M", "ss": "%S"}
_FMT_LITERALS = set("-:./ T_")
_EPOCH = datetime(1970, 1, 1)   # naive-UTC epoch (engine convention)


def _fmt_pattern(fmt: str) -> str:
    """Tokenize an ES date ``format`` string to a strftime/strptime
    pattern (shared by ``key_formatter`` and ``key_parser``). The SSS
    millisecond token compiles to the \\x00MS\\x00 marker the two
    compilers post-process differently."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "'":                      # quoted literal chunk
            j = fmt.find("'", i + 1)
            if j < 0:
                raise DateMathError(
                    f"bad date format {fmt!r}: unterminated quote")
            lit = fmt[i + 1:j] or "'"          # '' = a literal quote
            out.append(lit.replace("%", "%%"))
            i = j + 1
            continue
        for tok, strf in _FMT_TOKENS.items():
            if fmt.startswith(tok, i):
                out.append(strf)
                i += len(tok)
                break
        else:
            if fmt[i] == "S":                  # SSS… fractional seconds
                n = 0
                while i + n < len(fmt) and fmt[i + n] == "S":
                    n += 1
                if n != 3:
                    raise DateMathError(
                        f"bad date format {fmt!r}: only 'SSS' "
                        "millisecond precision is supported")
                out.append("\x00MS\x00")       # post-processed below
                i += n
            elif fmt[i] in _FMT_LITERALS:
                out.append(fmt[i])
                i += 1
            else:
                raise DateMathError(
                    f"unsupported date format token {fmt[i]!r} in "
                    f"{fmt!r} (supported: yyyy MM dd HH mm ss SSS, "
                    "quoted literals, separators, epoch_millis, "
                    "epoch_second)")
    return "".join(out)


def key_formatter(fmt: str):
    """Compile an ES date ``format`` string to a ``datetime -> str``
    renderer. Named formats ``epoch_millis`` / ``epoch_second`` and the
    token subset above are supported; anything else raises
    ``DateMathError`` at parse time (typed — never a silently odd
    key)."""
    if fmt == "epoch_millis":
        return lambda dt: str(int(epoch_millis(dt)))
    if fmt == "epoch_second":
        return lambda dt: str(int(epoch_millis(dt)) // 1000)
    pattern = _fmt_pattern(fmt)

    def render(dt: datetime) -> str:
        s = dt.strftime(pattern.replace("\x00MS\x00", "\x01"))
        return s.replace("\x01", f"{dt.microsecond // 1000:03d}")

    return render


def key_parser(fmt: str):
    """Compile an ES date ``format`` string to a ``str|num -> datetime``
    parser — the INVERSE of ``key_formatter``, same token subset.
    ``epoch_millis`` / ``epoch_second`` accept numbers or numeric
    strings; pattern formats parse via strptime (missing lower-order
    fields default to the unit start — the engine's documented
    down-rounding convention for both bound sides). A non-matching
    value raises ``DateMathError`` naming value and format."""
    if fmt in ("epoch_millis", "epoch_second"):
        scale = 1 if fmt == "epoch_millis" else 1000

        def parse_epoch(v: object) -> datetime:
            if isinstance(v, bool) or not isinstance(v, (int, float,
                                                         str)):
                raise DateMathError(
                    f"value {v!r} does not match format {fmt!r}")
            try:
                n = int(str(v).strip())
            except ValueError as e:
                raise DateMathError(
                    f"value {v!r} does not match format {fmt!r}") from e
            return _EPOCH + timedelta(milliseconds=n * scale)

        return parse_epoch
    pattern = _fmt_pattern(fmt).replace("\x00MS\x00", "%f")

    def parse(v: object) -> datetime:
        if not isinstance(v, str):
            raise DateMathError(
                f"value {v!r} does not match format {fmt!r}")
        try:
            return datetime.strptime(v, pattern)
        except ValueError as e:
            raise DateMathError(
                f"value {v!r} does not match format {fmt!r}") from e

    return parse


_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|m|h|H|d|w)\s*$")
_DURATION_MILLIS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                    "H": 3_600_000, "d": 86_400_000, "w": 604_800_000}


def duration_millis(raw: object) -> float:
    """Parse an ES time-value duration (``10d``, ``2h``, ``500ms``) to
    milliseconds — the unit decay scale/offset use on date fields
    (ES TimeValue: fixed units only, no months/years). Bare numbers
    pass through as millis."""
    if isinstance(raw, bool):
        raise DateMathError(f"bad duration {raw!r}")
    if isinstance(raw, (int, float)):
        return float(raw)
    m = _DURATION_RE.match(str(raw))
    if not m:
        raise DateMathError(
            f"bad duration {raw!r} (expected <number><ms|s|m|h|d|w>)")
    return float(m.group(1)) * _DURATION_MILLIS[m.group(2)]


def epoch_millis(dt: datetime) -> float:
    """Naive-UTC datetime → epoch milliseconds (the decay distance
    domain on date fields)."""
    return dt.replace(tzinfo=timezone.utc).timestamp() * 1000.0


def fmt(dt: datetime) -> str:
    """Concrete-bound literal the typed-literal cast consumes."""
    return dt.strftime("%Y-%m-%d %H:%M:%S") if dt.microsecond == 0 \
        else dt.strftime("%Y-%m-%d %H:%M:%S.%f")
