"""RainerScript built-in function library as Column functions.

Each function mirrors a reference script function
(/root/reference/grammar/rainerscript.c:4467-4510 registration table;
per-function impl cites below) expressed as built-in pyspark Column
expressions — JVM-side, whole-stage-codegen, no Python in the hot path.

Registered in :data:`REGISTRY` for the rule compiler's function-call
resolution (analog of rsyslog's scriptFunct lookup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    """Coerce an argument to a Column. Bare python values (including
    strings) are literals — pass F.col(...) explicitly for columns, as
    the rule compiler does."""
    return x if isinstance(x, Column) else F.lit(x)


# --- string functions ------------------------------------------------------

def strlen(s) -> Column:
    """rainerscript.c:2546"""
    return F.length(_c(s))


def tolower(s) -> Column:
    """rainerscript.c:2193"""
    return F.lower(_c(s))


def toupper(s) -> Column:
    """rainerscript.c:2212"""
    return F.upper(_c(s))


def ltrim(s) -> Column:
    """rainerscript.c:2103"""
    return F.ltrim(_c(s))


def rtrim(s) -> Column:
    """rainerscript.c:2130"""
    return F.rtrim(_c(s))


def substring(s, start, length) -> Column:
    """rainerscript.c:2571-2623 — 0-based start; negative length means
    'from the end' (drop -length chars)."""
    s = _c(s)
    if isinstance(length, int) and length < 0:
        return s.substr(
            F.lit(start + 1),
            F.greatest(F.lit(0), F.length(s) - start + length),
        )
    return s.substr(F.lit(start + 1), _c(length))


def replace(s, frm, to) -> Column:
    """rainerscript.c:2484 — literal (non-regex) replace."""
    return F.replace(_c(s), _c(frm), _c(to))


def wrap(s, wrapper, escape=None) -> Column:
    """rainerscript.c:2500 — wrap(s, w) = w||s'||w; 3-arg form first
    replaces occurrences of w in s with the escape string."""
    s = _c(s)
    if escape is not None:
        s = F.replace(s, _c(wrapper), _c(escape))
    return F.concat(_c(wrapper), s, _c(wrapper))


def field(s, delim, n) -> Column:
    """rainerscript.c:2625-2665 — 1-based field extraction; delimiter is
    a *literal* char code (int) or string (F.split takes a regex, so
    escape it); miss → '***FIELD NOT FOUND***'."""
    import re as _re

    if isinstance(delim, int):
        delim = chr(delim)
    got = F.try_element_at(F.split(_c(s), _re.escape(delim), -1), _c(n))
    return F.coalesce(got, F.lit("***FIELD NOT FOUND***"))


def re_match(s, pattern) -> Column:
    """rainerscript.c:2338 — POSIX ERE match (Java regex superset)."""
    return _c(s).rlike(pattern)


def re_match_i(s, pattern) -> Column:
    return _c(s).rlike(f"(?i){pattern}")


def re_extract(s, pattern, match=0, submatch=0, nomatch="") -> Column:
    """rainerscript.c:1681-1782 — extract submatch of the match-th
    occurrence; nomatch default on miss. match>0 uses regexp_extract_all."""
    if match == 0:
        got = F.regexp_extract(_c(s), pattern, submatch)
        return F.when(got != "", got).otherwise(F.lit(nomatch))
    allm = F.regexp_extract_all(_c(s), F.lit(pattern), F.lit(submatch))
    got = F.try_element_at(allm, F.lit(match + 1))
    return F.coalesce(got, F.lit(nomatch))


def split(s, sep) -> Column:
    """rainerscript.c:3245-3330 — split on a literal separator to array
    (JSON array in the reference)."""
    import re as _re

    if isinstance(sep, int):
        sep = chr(sep)
    return F.split(_c(s), _re.escape(sep), -1)


def b64_decode(s) -> Column:
    """rainerscript.c:3191"""
    return F.unbase64(_c(s)).cast("string")


def int2hex(n) -> Column:
    """rainerscript.c:2458"""
    return F.lower(F.hex(_c(n)))


# --- casts -----------------------------------------------------------------

def cstr(x) -> Column:
    """rainerscript.c:2237"""
    return _c(x).cast("string")


def cnum(x) -> Column:
    """rainerscript.c:2254 — to int64; non-coercible → 0 (var2Number
    semantics, rainerscript.c:1490)."""
    return F.coalesce(_c(x).try_cast("long"), F.lit(0))


def cbool(x) -> Column:
    """rainerscript.c:2305"""
    return _c(x).cast("boolean")


# --- network ---------------------------------------------------------------

def ipv42num(ip) -> Column:
    """rainerscript.c:2365 — dotted quad → uint32 (null if malformed)."""
    parts = F.split(_c(ip), r"\.")
    ok = (F.size(parts) == 4) & _c(ip).rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    octet = lambda i: F.try_element_at(parts, F.lit(i)).try_cast("long")  # noqa: E731
    val = (
        octet(1) * 16777216 + octet(2) * 65536 + octet(3) * 256 + octet(4)
    )
    valid = ok & (octet(1) <= 255) & (octet(2) <= 255) & (octet(3) <= 255) & (octet(4) <= 255)
    return F.when(valid, val)


def num2ipv4(n) -> Column:
    """rainerscript.c:3036 — uint32 → dotted quad; out-of-range → '-1'
    (reference returns "-1" on error)."""
    n = _c(n).cast("long")
    quad = F.concat_ws(
        ".",
        ((n / 16777216) % 256).cast("int").cast("string"),
        ((n / 65536) % 256).cast("int").cast("string"),
        ((n / 256) % 256).cast("int").cast("string"),
        (n % 256).cast("int").cast("string"),
    )
    return F.when((n >= 0) & (n <= 4294967295), quad).otherwise(F.lit("-1"))


def is_in_subnet(ip, cidr: str) -> Column:
    """rainerscript.c:3514 — CIDR containment on ipv4."""
    net, bits = cidr.split("/")
    bits = int(bits)
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
    import ipaddress

    netnum = int(ipaddress.IPv4Address(net)) & mask
    return ipv42num(ip).bitwiseAND(F.lit(mask)) == F.lit(netnum)


# --- time ------------------------------------------------------------------

def format_time(unixts, fmt: str = "date-rfc3339") -> Column:
    """rainerscript.c:2744-2800 — unix ts → formatted string."""
    t = F.from_unixtime(_c(unixts).cast("long"))
    if fmt in ("date-rfc3339", "rfc3339"):
        return F.date_format(t, "yyyy-MM-dd'T'HH:mm:ssXXX")
    if fmt in ("date-rfc3164", "rfc3164"):
        return F.concat(
            F.date_format(t, "MMM"),
            F.format_string("%3d", F.dayofmonth(t)),
            F.lit(" "),
            F.date_format(t, "HH:mm:ss"),
        )
    return F.date_format(t, fmt)


def parse_time(s) -> Column:
    """rainerscript.c:2822-2863 — RFC3339 or RFC3164 string → unix ts.
    RFC3164 has no year: estimated per estimateYear (rainerscript.c:2810)
    relative to the session's current date."""
    s = _c(s)
    t3339 = F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"))
    t3339b = F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss"))
    cur_year = F.year(F.current_date())
    t3164 = F.try_to_timestamp(
        F.concat(cur_year.cast("string"), F.lit(" "), F.regexp_replace(s, "  ", " ")),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    # estimateYear: if parsed month is > 1 month in the future, it was
    # last year
    t3164 = F.when(
        t3164 > F.add_months(F.current_timestamp(), 1),
        F.try_to_timestamp(
            F.concat((cur_year - 1).cast("string"), F.lit(" "), F.regexp_replace(s, "  ", " ")),
            F.lit("yyyy MMM d HH:mm:ss"),
        ),
    ).otherwise(t3164)
    return F.unix_timestamp(F.coalesce(t3339, t3339b, t3164))


def is_time(s, fmt: str | None = None) -> Column:
    """rainerscript.c:2983"""
    if fmt is None:
        return parse_time(s).isNotNull()
    return F.try_to_timestamp(_c(s), F.lit(fmt)).isNotNull()


# --- json ------------------------------------------------------------------

def parse_json(s) -> Column:
    """rainerscript.c:1868 — parse into a map (CEE tree analog)."""
    return F.from_json(_c(s), "map<string,string>")


def unflatten(s, sep=".") -> Column:
    """contrib/fmunflatten — kept as map here; nesting left to caller."""
    return parse_json(s)


def append_json(src, dst) -> Column:
    """rainerscript.c:3614 — merge two CEE maps; dst values win on key
    collision (reference merges src INTO dst)."""
    return F.map_zip_with(
        _c(src), _c(dst), lambda k, v1, v2: F.coalesce(v2, v1)
    )


def get_property(obj, name) -> Column:
    """rainerscript.c:1930 — dynamic property access on a map column."""
    return F.try_element_at(_c(obj), _c(name))


# --- hashing (contrib/fmhash, xxhash) ---------------------------------------

def hash64(s) -> Column:
    """contrib/fmhash/fmhash.c:350-356 (xxhash64)."""
    return F.xxhash64(_c(s))


def hash32(s) -> Column:
    return F.hash(_c(s)).cast("long") & F.lit(0xFFFFFFFF)


def hash64mod(s, mod) -> Column:
    return F.pmod(hash64(s), F.lit(mod))


def hash32mod(s, mod) -> Column:
    return F.pmod(hash32(s), F.lit(mod))


# --- misc ------------------------------------------------------------------

def random(maxv) -> Column:
    """rainerscript.c:2059 — seeded for determinism in tests."""
    return (F.rand(seed=42) * _c(maxv)).cast("long")


def exists(col) -> Column:
    """grammar.y:78 exists($!x)"""
    return _c(col).isNotNull()


def tocef(*parts) -> Column:
    """rainerscript.c:3368 — CEF:0|dev_vendor|...|ext ; ext escaping of
    '=' and '\\' per cef_ext_escape (rainerscript.c:3429)."""
    hdr = [_c(p) for p in parts[:7]]
    ext = parts[7] if len(parts) > 7 else F.lit("")
    esc = F.regexp_replace(
        F.regexp_replace(_c(ext), r"\\", r"\\\\"), "=", r"\\="
    )
    return F.concat(F.lit("CEF:0|"), F.concat_ws("|", *hdr), F.lit("|"), esc)


REGISTRY = {
    "strlen": strlen, "tolower": tolower, "toupper": toupper,
    "ltrim": ltrim, "rtrim": rtrim, "substring": substring,
    "replace": replace, "wrap": wrap, "field": field,
    "re_match": re_match, "re_match_i": re_match_i,
    "re_extract": re_extract, "split": split, "b64_decode": b64_decode,
    "int2hex": int2hex, "cstr": cstr, "cnum": cnum, "cbool": cbool,
    "ipv42num": ipv42num, "ip42num": ipv42num, "num2ipv4": num2ipv4,
    "is_in_subnet": is_in_subnet, "format_time": format_time,
    "parse_time": parse_time, "is_time": is_time,
    "parse_json": parse_json, "unflatten": unflatten,
    "hash64": hash64, "hash32": hash32, "hash64mod": hash64mod,
    "hash32mod": hash32mod, "random": random, "exists": exists,
    "tocef": tocef, "append_json": append_json, "get_property": get_property,
}
