"""Message-modification operators (the mm* plugin family, SURVEY.md §2.3).

Each is a per-row transform over parsed columns — narrow projections,
no shuffle, all JVM-side expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --- mmjsonparse (plugins/mmjsonparse/mmjsonparse.c:64-136,210-317) ----------

CEE_COOKIE = "@cee:"


def mmjsonparse(
    df: DataFrame, msg_col: str = "msg", out_col: str = "cee",
    find_json: bool = False,
) -> DataFrame:
    """Find the @cee: cookie (or, in find-json mode, the first '{') and
    parse the JSON payload into a map column + success flag."""
    msg = F.ltrim(F.col(msg_col))
    if find_json:
        payload = F.when(
            F.instr(msg, "{") > 0, F.substr(msg, F.instr(msg, "{"))
        )
    else:
        payload = F.when(
            msg.startswith(CEE_COOKIE),
            F.ltrim(msg.substr(F.lit(len(CEE_COOKIE) + 1), F.length(msg))),
        )
    parsed = F.from_json(payload, "map<string,string>")
    return df.withColumn(out_col, parsed).withColumn(
        "parse_json_success", parsed.isNotNull()
    )


# --- mmfields (plugins/mmfields/mmfields.c:54-124) ---------------------------

def mmfields(
    df: DataFrame, msg_col: str = "msg", sep: str = ",",
    prefix: str = "f", max_fields: int | None = None,
) -> DataFrame:
    """Split msg on a single-char separator into $!f1..$!fN columns.
    (The reference numbers fields from 1, mmfields.c:178-219.)"""
    arr = F.split(F.col(msg_col), re.escape(sep), -1)
    df = df.withColumn("_mmf", arr)
    n = max_fields or 8
    for i in range(1, n + 1):
        df = df.withColumn(f"{prefix}{i}", F.try_element_at("_mmf", F.lit(i)))
    return df.drop("_mmf")


# --- mmpstrucdata (plugins/mmpstrucdata) -------------------------------------

_SD_PARAM_RE = r'(\w[\w.@-]*)="((?:[^"\\]|\\.)*)"'


def mmpstrucdata(
    df: DataFrame, sd_col: str = "structured_data", out_col: str = "sd_params"
) -> DataFrame:
    """Parse RFC5424 structured data into a map of param name→value
    (flattened across SD elements; later SD-ids win on key collision).
    '-' or null SD → null map."""
    names = F.regexp_extract_all(F.col(sd_col), F.lit(_SD_PARAM_RE), F.lit(1))
    vals = F.regexp_extract_all(F.col(sd_col), F.lit(_SD_PARAM_RE), F.lit(2))
    m = F.when(
        F.col(sd_col).isNotNull() & (F.col(sd_col) != "-") & (F.size(names) > 0),
        F.map_from_arrays(names, vals),
    )
    sd_id = F.regexp_extract(F.col(sd_col), r"\[([\w.@-]+)[ \]]", 1)
    return df.withColumn(out_col, m).withColumn(
        "sd_id", F.when(F.col(sd_col) != "-", F.when(sd_id != "", sd_id))
    )


# --- mmanon (plugins/mmanon/mmanon.c:155-169) --------------------------------

def _ip_to_long(ip: Column) -> Column:
    parts = F.split(ip, r"\.")
    o = lambda i: F.try_element_at(parts, F.lit(i)).try_cast("long")  # noqa: E731
    return o(1) * 16777216 + o(2) * 65536 + o(3) * 256 + o(4)


def _long_to_ip(n: Column) -> Column:
    return F.concat_ws(
        ".",
        ((n / 16777216) % 256).cast("int").cast("string"),
        ((n / 65536) % 256).cast("int").cast("string"),
        ((n / 256) % 256).cast("int").cast("string"),
        (n % 256).cast("int").cast("string"),
    )


def mmanon_embedded(col: Column, bits: int = 16) -> Column:
    """Zero-mode anonymization of every IPv4 *embedded in free text*
    (mmanon.c ipv4.bits, zero mode). Octet-aligned bit counts only —
    textual zeroing of the masked octets keeps the whole transform one
    JVM regexp_replace."""
    if bits not in (8, 16, 24, 32):
        raise ValueError("embedded-text mode supports bits in {8,16,24,32}")
    keep = 4 - bits // 8  # leading octets preserved
    if keep == 0:
        pattern = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
        return F.regexp_replace(col, pattern, "0.0.0.0")
    pattern = (
        rf"\b((?:\d{{1,3}}\.){{{keep - 1}}}\d{{1,3}})(?:\.\d{{1,3}}){{{4 - keep}}}\b"
    )
    return F.regexp_replace(col, pattern, "$1" + ".0" * (4 - keep))


def mmanon_ip(col: Column, bits: int = 16, mode: str = "zero") -> Column:
    """Anonymize a pure-IPv4 column with arbitrary bit count (arithmetic
    mask). random-consistent mode maps the host part via xxhash64 —
    deterministic per value (divergence: the reference draws a random
    mapping table, mmanon.c)."""
    n = _ip_to_long(col)
    mask = (0xFFFFFFFF << bits) & 0xFFFFFFFF
    base = n.bitwiseAND(F.lit(mask))
    if mode == "zero":
        return _long_to_ip(base)
    hashed = F.pmod(F.xxhash64(col), F.lit(max(1, 1 << bits)))
    return _long_to_ip(base + hashed)


def mmanon(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Zero-mode embedded-text anonymization over the given columns."""
    for c in cols:
        df = df.withColumn(c, mmanon_embedded(F.col(c), bits))
    return df


# --- small fixups ------------------------------------------------------------

def mmrm1stspace(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """plugins/mmrm1stspace: drop ONE leading space of MSG."""
    return df.withColumn(
        msg_col, F.regexp_replace(F.col(msg_col), r"^ ", "")
    )


def mmutf8fix(df: DataFrame, msg_col: str = "msg", repl: str = " ") -> DataFrame:
    """plugins/mmutf8fix: replace invalid UTF-8. Decoded Spark strings
    carry U+FFFD for undecodable bytes; normalize those plus raw
    control chars."""
    return df.withColumn(
        msg_col,
        F.regexp_replace(F.col(msg_col), "[�\x00-\x08\x0b-\x1f]", repl),
    )


def mmtaghostname(df: DataFrame) -> DataFrame:
    """plugins/mmtaghostname: when the 3164 heuristic stole the TAG as a
    hostname (headerless messages), restore tag & clear hostname."""
    broken = F.col("hostname").isNotNull() & F.col("syslogtag").isNull()
    return df.withColumn(
        "syslogtag", F.when(broken, F.col("hostname")).otherwise(F.col("syslogtag"))
    ).withColumn("hostname", F.when(~broken, F.col("hostname")))


# --- mmnormalize (plugins/mmnormalize, liblognorm rulebases) ------------------

_TYPE_PATTERNS = {
    "number": r"(\d+)",
    "word": r"(\S+)",
    "alpha": r"([A-Za-z]+)",
    "rest": r"(.*)",
    "ipv4": r"(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})",
    "quoted-string": r'"((?:[^"\\]|\\.)*)"',
}


class NormalizeRule:
    """One liblognorm-style rule: literal text with %field:type% or
    %field:char-to:X% placeholders. Compiles to a single Java regex with
    one capture group per field."""

    def __init__(self, pattern: str, tags: list[str] | None = None):
        self.pattern = pattern
        self.tags = tags or []
        self.fields: list[str] = []
        out = []
        pos = 0
        for m in re.finditer(r"%([^%:]+):([^%]+)%", pattern):
            out.append(re.escape(pattern[pos : m.start()]))
            name, ftype = m.group(1), m.group(2)
            self.fields.append(name)
            if ftype.startswith("char-to:"):
                stop = re.escape(ftype.split(":", 1)[1])
                out.append(f"([^{stop}]*)")
            else:
                pat = _TYPE_PATTERNS.get(ftype)
                if pat is None:
                    raise ValueError(f"unsupported lognorm type {ftype!r}")
                out.append(pat)
            pos = m.end()
        out.append(re.escape(pattern[pos:]))
        self.regex = "^" + "".join(out) + "$"


def mmnormalize(
    df: DataFrame, rules: list[NormalizeRule], msg_col: str = "msg",
    out_col: str = "norm",
) -> DataFrame:
    """First matching rule wins (parser-chain order, mmnormalize.c:146-172);
    extracted fields land in a map column ``norm`` plus ``norm_rule``
    (index of the winning rule, -1 = unparsed — the reference tags such
    messages 'unparsed-data')."""
    msg = F.col(msg_col)
    rule_idx = F.lit(-1)
    result = F.lit(None).cast("map<string,string>")
    # build right-to-left so earlier rules take precedence
    for i in range(len(rules) - 1, -1, -1):
        r = rules[i]
        hit = msg.rlike(r.regex)
        entries = []
        for gi, fname in enumerate(r.fields, start=1):
            entries.append(
                F.struct(
                    F.lit(fname).alias("key"),
                    F.regexp_extract(msg, r.regex, gi).alias("value"),
                )
            )
        m = F.map_from_entries(F.array(*entries)) if entries else F.create_map()
        result = F.when(hit, m).otherwise(result)
        rule_idx = F.when(hit, F.lit(i)).otherwise(rule_idx)
    return df.withColumn(out_col, result).withColumn("norm_rule", rule_idx)
