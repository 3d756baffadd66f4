"""RainerScript function library + template compiler unit tests
(reference analog: tests/rscript_*.sh golden-output tests)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import rsyslog_spark.functions as fn
from rsyslog_spark.rules.compiler import Env
from rsyslog_spark.templates import compile_template


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def ev(one, col):
    return one.select(col.alias("r")).first().r


def test_string_functions(one):
    assert ev(one, fn.strlen(F.lit("hello"))) == 5
    assert ev(one, fn.tolower(F.lit("AbC"))) == "abc"
    assert ev(one, fn.toupper(F.lit("AbC"))) == "ABC"
    assert ev(one, fn.ltrim(F.lit("  x "))) == "x "
    assert ev(one, fn.rtrim(F.lit(" x  "))) == " x"
    # substring(str, start0, len); negative len = from end
    assert ev(one, fn.substring(F.lit("abcdef"), 1, 3)) == "bcd"
    assert ev(one, fn.substring(F.lit("abcdef"), 1, -1)) == "bcde"
    assert ev(one, fn.replace(F.lit("a.b.c"), ".", "-")) == "a-b-c"
    assert ev(one, fn.wrap(F.lit("x"), '"')) == '"x"'
    assert ev(one, fn.wrap(F.lit('a"b'), '"', "'")) == '"a\'b"'
    assert ev(one, fn.int2hex(F.lit(255))) == "ff"
    assert ev(one, fn.b64_decode(F.lit("aGk="))) == "hi"


def test_field_function(one):
    # rscript_field.sh analog: field(str, delim, n), 1-based
    s = F.lit("a,b,c,d")
    assert ev(one, fn.field(s, ord(","), 2)) == "b"
    assert ev(one, fn.field(s, ",", 4)) == "d"
    assert ev(one, fn.field(s, ",", 9)) == "***FIELD NOT FOUND***"


def test_regex_functions(one):
    assert ev(one, fn.re_match(F.lit("foo123"), r"[0-9]+"))
    assert not ev(one, fn.re_match(F.lit("foo"), r"^[0-9]+$"))
    assert ev(one, fn.re_match_i(F.lit("FOO"), r"foo"))
    assert ev(one, fn.re_extract(F.lit("a=1 b=2"), r"b=([0-9])", 0, 1, "no")) == "2"
    assert ev(one, fn.re_extract(F.lit("a=1"), r"z=([0-9])", 0, 1, "no")) == "no"


def test_net_functions(one):
    assert ev(one, fn.ipv42num(F.lit("10.0.1.0"))) == 167772416
    assert ev(one, fn.ipv42num(F.lit("999.0.0.1"))) is None
    assert ev(one, fn.num2ipv4(F.lit(167772416))) == "10.0.1.0"
    assert ev(one, fn.num2ipv4(F.lit(-5))) == "-1"
    assert ev(one, fn.is_in_subnet(F.lit("192.168.1.77"), "192.168.1.0/24"))
    assert not ev(one, fn.is_in_subnet(F.lit("192.168.2.1"), "192.168.1.0/24"))


def test_time_functions(one):
    assert (
        ev(one, fn.format_time(F.lit(1714145396), "date-rfc3339"))
        == "2024-04-26T15:29:56Z"
    )
    assert (
        ev(one, fn.format_time(F.lit(1714145396), "date-rfc3164"))
        == "Apr 26 15:29:56"
    )
    assert ev(one, fn.parse_time(F.lit("2024-04-26T15:29:56Z"))) == 1714145396
    assert ev(one, fn.is_time(F.lit("2024-04-26T15:29:56Z")))
    assert not ev(one, fn.is_time(F.lit("not a time")))


def test_json_and_hash(one):
    m = ev(one, fn.parse_json(F.lit('{"a":"1","b":"x"}')))
    assert m == {"a": "1", "b": "x"}
    assert isinstance(ev(one, fn.hash64(F.lit("abc"))), int)
    assert 0 <= ev(one, fn.hash64mod(F.lit("abc"), 10)) < 10


def test_casts(one):
    assert ev(one, fn.cnum(F.lit("42"))) == 42
    assert ev(one, fn.cnum(F.lit("xyz"))) == 0  # var2Number semantics
    assert ev(one, fn.cstr(F.lit(42))) == "42"


def test_tocef(one):
    got = ev(
        one,
        fn.tocef(
            F.lit("Vendor"), F.lit("Prod"), F.lit("1.0"), F.lit("42"),
            F.lit("name"), F.lit("5"), F.lit(""), F.lit("k=v\\x"),
        ),
    )
    assert got.startswith("CEF:0|Vendor|Prod|1.0|42|name|5|")
    assert "k\\=v\\\\x" in got


# ---------------- templates ----------------

@pytest.fixture(scope="module")
def logrow(spark):
    return spark.createDataFrame(
        [
            (
                "Jun 15 10:54:39", "host7", "app[42]:", " the msg\n",
                13, 1, 5, "app", "42", None, None,
            )
        ],
        "timereported_str string, hostname string, syslogtag string, "
        "msg string, pri int, facility int, severity int, "
        "programname string, procid string, msgid string, "
        "structured_data string",
    )


def trender(logrow, tpl):
    return logrow.select(compile_template(tpl).alias("r")).first().r


def test_template_constants_and_props(logrow):
    assert trender(logrow, "host=%hostname% tag=%syslogtag%") == (
        "host=host7 tag=app[42]:"
    )


def test_template_substring_and_case(logrow):
    assert trender(logrow, "%hostname:1:4%") == "host"
    assert trender(logrow, "%hostname:::uppercase%") == "HOST7"


def test_template_traditional_file_format(logrow):
    got = trender(logrow, "RSYSLOG_TraditionalFileFormat")
    # sp-if-no-1st-sp: msg starts with space → no extra space;
    # drop-last-lf strips the trailing newline
    assert got == "Jun 15 10:54:39 host7 app[42]: the msg"


def test_template_csv_and_json_escaping(spark):
    df = spark.createDataFrame([('say "hi", ok',)], "msg string")
    got = df.select(compile_template("%msg:::csv%").alias("r")).first().r
    assert got == '"say ""hi"", ok"'
    got = df.select(compile_template("%msg:::json%").alias("r")).first().r
    assert got == 'say \\"hi\\", ok'


def test_template_field_mode(spark):
    df = spark.createDataFrame([("a|b|c",)], "msg string")
    got = df.select(compile_template("%msg:F,124:2%").alias("r")).first().r
    assert got == "b"


def test_template_fac_sev_text(logrow):
    got = trender(logrow, "%syslogfacility-text%.%syslogseverity-text%")
    assert got == "user.notice"


def test_template_date_options(logrow):
    # 3164 string parse + year estimation happens via parse_time
    got = trender(logrow, "%timereported:::date-month%")
    assert got == "06"
