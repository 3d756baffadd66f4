"""RainerScript built-in function library as Column functions.

Each function mirrors a reference script function
(/root/reference/grammar/rainerscript.c:4467-4510 registration table;
per-function impl cites below) expressed as built-in pyspark Column
expressions — JVM-side, whole-stage-codegen, no Python in the hot path.

Registered in :data:`REGISTRY` for the rule compiler's function-call
resolution (analog of rsyslog's scriptFunct lookup).
"""

from __future__ import annotations

import pandas as pd
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

# strftime → Java SimpleDateFormat conversion table (the subset that
# appears in rsyslog configs; %e is day-space-padded — handled apart)
_STRFTIME_MAP = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%b": "MMM", "%B": "MMMM", "%a": "EEE",
    "%A": "EEEE", "%j": "DDD", "%Z": "zz", "%z": "xx", "%p": "a",
    "%I": "hh", "%%": "'%'",
}


def _strftime_to_java(fmt: str) -> str:
    out, i, lit = [], 0, []

    def flush():
        if lit:
            text = "".join(lit).replace("'", "''")
            out.append(f"'{text}'" if text else "")
            lit.clear()

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            spec = fmt[i : i + 2]
            if spec in _STRFTIME_MAP:
                flush()
                out.append(_STRFTIME_MAP[spec])
                i += 2
                continue
        lit.append(fmt[i])
        i += 1
    flush()
    return "".join(out)


def format_time(unixts, fmt: str = "date-rfc3339") -> Column:
    """rainerscript.c:2744-2800 → datetime.c formatUnixTimeFromTime_t:
    unix ts → formatted string. The reference accepts date-rfc3339 /
    date-rfc3164; strftime-style %specs are additionally translated
    (the documented rsyslog format_time extension surface), and
    anything else is treated as a Java date pattern."""
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
    if "%" in fmt:
        # %e = space-padded day (no SimpleDateFormat equivalent)
        parts = fmt.split("%e")
        cols = [F.date_format(t, _strftime_to_java(p)) if p else F.lit("")
                for p in parts]
        day = F.format_string("%2d", F.dayofmonth(t))
        mixed = [cols[0]]
        for c in cols[1:]:
            mixed += [day, c]
        return F.concat(*mixed) if len(mixed) > 1 else mixed[0]
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


def parse_time_localtz(s, tz: str | None = None) -> Column:
    """rainerscript.c:2865-2905 — like parse_time but the wall-clock
    string is interpreted in the LOCAL timezone
    (syslogTime2time_tLocalTZ) instead of UTC. `tz` defaults to the
    host's TZ env (the reference uses the process TZ); an RFC3339
    string carrying an explicit offset keeps its own offset."""
    import os

    tz = tz or os.environ.get("TZ") or "UTC"
    s = _c(s)
    # explicit-offset 3339 → offset wins (same as parse_time)
    t_off = F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"))
    # offset-less forms → wall clock in tz
    naive3339 = F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss"))
    cur_year = F.year(F.current_date())
    naive3164 = F.try_to_timestamp(
        F.concat(cur_year.cast("string"), F.lit(" "),
                 F.regexp_replace(s, "  ", " ")),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    naive3164 = F.when(
        naive3164 > F.add_months(F.current_timestamp(), 1),
        F.try_to_timestamp(
            F.concat((cur_year - 1).cast("string"), F.lit(" "),
                     F.regexp_replace(s, "  ", " ")),
            F.lit("yyyy MMM d HH:mm:ss"),
        ),
    ).otherwise(naive3164)
    local = F.to_utc_timestamp(F.coalesce(naive3339, naive3164), tz)
    return F.unix_timestamp(F.coalesce(t_off, local))


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
    """contrib/fmunflatten — FLAT map form (documented divergence: the
    CEE column type here is map<string,string>, so dotted keys stay
    flat; use :func:`unflatten_json` for the reference's nested-tree
    output, fmunflatten.c:206)."""
    return parse_json(s)


def unflatten_json(s, sep: str = ".") -> Column:
    """contrib/fmunflatten/fmunflatten.c:206 — nested-tree output as a
    JSON string: {"a.b":1,"a.c":2} → {"a":{"b":1,"c":2}}. Arrow-batched
    UDF (tree construction is genuinely recursive; rare script fn)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _unflat(col: pd.Series) -> pd.Series:
        import json

        def go(v):
            if v is None:
                return None
            try:
                flat = json.loads(v)
            except (TypeError, ValueError):
                return None
            if not isinstance(flat, dict):
                return json.dumps(flat)
            root: dict = {}
            for k, val in flat.items():
                node = root
                parts = str(k).split(sep)
                for p in parts[:-1]:
                    nxt = node.get(p)
                    if not isinstance(nxt, dict):
                        nxt = {}
                        node[p] = nxt
                    node = nxt
                node[parts[-1]] = val
            return json.dumps(root, separators=(",", ":"))

        return col.map(go)

    return _unflat(_c(s))


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
    """contrib/fmhash/fmhash.c (hash64 = XXH64). Divergence note:
    Spark's xxhash64 is XXH64 with seed 42 where fmhash defaults to
    seed 0 — stable and collision-equivalent, but not byte-identical
    to the reference's value for the same input."""
    return F.xxhash64(_c(s))


_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 from the public xxHash spec — byte-identical to the
    XXH32() the reference fmhash calls (fmhash.c:137). Pure Python:
    hash32 is a rare script function, not a hot-path primitive; the
    UDF below Arrow-batches it."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                v = (v + lane * _P2) & _M32
                v = (_rotl32(v, 13) * _P1) & _M32
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        acc = (acc + lane * _P3) & _M32
        acc = (_rotl32(acc, 17) * _P4) & _M32
        i += 4
    while i < n:
        acc = (acc + data[i] * _P5) & _M32
        acc = (_rotl32(acc, 11) * _P1) & _M32
        i += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


def hash32(s, seed: int = 0) -> Column:
    """contrib/fmhash/fmhash.c:137 — XXH32(input, seed), byte-faithful
    (Arrow-batched pandas UDF over the spec implementation above)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _xxh32_udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: xxh32(str(v).encode("utf-8"), seed) if v is not None
            else None
        ).astype("Int64")

    return _xxh32_udf(_c(s))


def hash64mod(s, mod) -> Column:
    return F.pmod(hash64(s), F.lit(mod))


def hash32mod(s, mod) -> Column:
    return F.pmod(hash32(s), F.lit(mod))


# --- faup URL decomposition (contrib/ffaup/ffaup.c:306-318) ------------------
# faup links libfaup; each faup_<part>(url) extracts one URL component.
# Mapping: Spark's parse_url covers scheme/host/userinfo/path/query/
# fragment natively; port comes off the authority; domain/tld splits are
# label-based (libfaup consults the Mozilla public-suffix list — label
# splitting is the documented approximation here: 'co.uk'-style
# multi-label suffixes resolve one label short).

def _url(u) -> Column:
    return _c(u)


def faup_scheme(u) -> Column:
    return F.lower(F.parse_url(_url(u), F.lit("PROTOCOL")))


def faup_host(u) -> Column:
    return F.lower(F.parse_url(_url(u), F.lit("HOST")))


def faup_credential(u) -> Column:
    return F.parse_url(_url(u), F.lit("USERINFO"))


def faup_port(u) -> Column:
    auth = F.parse_url(_url(u), F.lit("AUTHORITY"))
    p = F.regexp_extract(auth, r":(\d+)$", 1)
    return F.when(p != "", p.cast("long"))


def faup_resource_path(u) -> Column:
    return F.parse_url(_url(u), F.lit("PATH"))


def faup_query_string(u) -> Column:
    return F.parse_url(_url(u), F.lit("QUERY"))


def faup_fragment(u) -> Column:
    return F.parse_url(_url(u), F.lit("REF"))


def faup_tld(u) -> Column:
    h = faup_host(u)
    return F.when(h.rlike(r"\."), F.regexp_extract(h, r"\.([^.]+)$", 1))


def faup_domain(u) -> Column:
    h = faup_host(u)
    return F.when(h.rlike(r"\."), F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1))


def faup_domain_without_tld(u) -> Column:
    d = faup_domain(u)
    return F.regexp_extract(d, r"^([^.]+)", 1)


def faup_subdomain(u) -> Column:
    h, d = faup_host(u), faup_domain(u)
    return F.when(
        h.isNotNull() & d.isNotNull() & (F.length(h) > F.length(d)),
        F.substr(h, F.lit(1), F.length(h) - F.length(d) - 1),
    )


def faup(u) -> Column:
    """Full decomposition as a JSON object (ffaup's faup() returns the
    all-parts structure)."""
    return F.to_json(
        F.struct(
            faup_scheme(u).alias("scheme"),
            faup_credential(u).alias("credential"),
            faup_subdomain(u).alias("subdomain"),
            faup_domain(u).alias("domain"),
            faup_domain_without_tld(u).alias("domain_without_tld"),
            faup_host(u).alias("host"),
            faup_tld(u).alias("tld"),
            faup_port(u).alias("port"),
            faup_resource_path(u).alias("resource_path"),
            faup_query_string(u).alias("query_string"),
            faup_fragment(u).alias("fragment"),
        )
    )


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
    # plugins/fmpcre/fmpcre.c:93 — PCRE collapses under Java regex
    "pcre_match": re_match,
    "re_extract": re_extract, "split": split, "b64_decode": b64_decode,
    "int2hex": int2hex, "cstr": cstr, "cnum": cnum, "cbool": cbool,
    "ipv42num": ipv42num, "ip42num": ipv42num, "num2ipv4": num2ipv4,
    "is_in_subnet": is_in_subnet, "format_time": format_time,
    "parse_time": parse_time, "parse_time_localtz": parse_time_localtz,
    "is_time": is_time,
    "faup": faup, "faup_scheme": faup_scheme,
    "faup_credential": faup_credential, "faup_subdomain": faup_subdomain,
    "faup_domain": faup_domain,
    "faup_domain_without_tld": faup_domain_without_tld,
    "faup_host": faup_host, "faup_tld": faup_tld, "faup_port": faup_port,
    "faup_resource_path": faup_resource_path,
    "faup_query_string": faup_query_string, "faup_fragment": faup_fragment,
    "parse_json": parse_json, "unflatten": unflatten,
    "unflatten_json": unflatten_json,
    "hash64": hash64, "hash32": hash32, "hash64mod": hash64mod,
    "hash32mod": hash32mod, "random": random, "exists": exists,
    "tocef": tocef, "append_json": append_json, "get_property": get_property,
}
