"""Lookup-table flavors + aggregation operators.

Reference analogs: tests/lookup_table.sh, lookup_sparse_array_ipv4.sh
(fixture format tests/testsuites/*.lkp_tbl), tests/dynstats.sh,
action-ratelimit-*.sh."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rsyslog_spark import aggregates as agg
from rsyslog_spark.lookup import LookupTable, enrich_sources

SPARSE_JSON = """
{ "version": 1, "nomatch": "unk", "type": "sparseArray",
  "table": [
    {"index": 167772160, "value": "NetA"},
    {"index": 167772416, "value": "Gap"},
    {"index": 167772672, "value": "NetB"} ] }
"""


def test_string_lookup(spark):
    t = LookupTable("xlate", "string",
                    [("msgnum:00000000:", "foo"), ("msgnum:00000001:", "bar")],
                    nomatch="nomatch")
    df = spark.createDataFrame(
        [("msgnum:00000000:",), ("msgnum:00000001:",), ("other",)], "k string"
    )
    got = [r.v for r in df.select(t.lookup_col(F.col("k")).alias("v")).collect()]
    assert got == ["foo", "bar", "nomatch"]
    # broadcast-join path agrees
    got2 = [r.v for r in t.enrich(df, "k", "v").orderBy("k").collect()]
    assert sorted(got) == sorted(got2)


def test_sparse_array_lookup(spark):
    # greatest key <= probe (lookup.c:437-485); below first key → nomatch
    t = LookupTable.from_json("ipranges", SPARSE_JSON)
    df = spark.createDataFrame(
        [(167772160,), (167772300,), (167772416,), (167772700,), (100,)],
        "k long",
    )
    got = [r.v for r in df.select(t.lookup_col(F.col("k")).alias("v")).collect()]
    assert got == ["NetA", "NetA", "Gap", "NetB", "unk"]
    got2 = [r.v for r in t.enrich(df, "k", "v").orderBy("k").collect()]
    assert got2 == ["unk", "NetA", "NetA", "Gap", "NetB"]


def test_array_lookup(spark):
    t = LookupTable("arr", "array", [(100, "a"), (101, "b"), (102, "c")],
                    nomatch="-")
    df = spark.createDataFrame([(100,), (102,), (99,), (103,)], "k long")
    got = [r.v for r in df.select(t.lookup_col(F.col("k")).alias("v")).collect()]
    assert got == ["a", "c", "-", "-"]


def test_regex_lookup(spark):
    t = LookupTable("re", "regex",
                    [("^ERR", "error"), ("^WARN", "warning"), (".", "other")])
    df = spark.createDataFrame([("ERR x",), ("WARN y",), ("info",)], "k string")
    got = [r.v for r in df.select(t.lookup_col(F.col("k")).alias("v")).collect()]
    assert got == ["error", "warning", "other"]


def test_enrich_sources_broadcast(spark):
    facts = spark.createDataFrame([("src0", 1), ("src1", 2)], "source string, x int")
    dims = spark.createDataFrame(
        [("src0", "siteA"), ("src1", "siteB")], "source string, site string"
    )
    j = enrich_sources(facts, dims)
    assert {r.site for r in j.collect()} == {"siteA", "siteB"}
    assert "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan().toString()


# ---------------- aggregates ----------------

def test_dynstats_golden(spark):
    # dynstats.sh golden: foo=3 bar=1 baz=2 over field(msg,32,1)-style keys
    df = spark.createDataFrame(
        [("foo 1",), ("foo 2",), ("foo 3",), ("bar 1",), ("baz 1",), ("baz 2",)],
        "msg string",
    )
    from rsyslog_spark.functions import field

    keyed = df.withColumn("k", field(F.col("msg"), " ", 1))
    got = dict(
        (r.k, r.n) for r in agg.dyn_stats(keyed, ["k"]).collect()
    )
    assert got == {"foo": 3, "bar": 1, "baz": 2}


def test_salted_counts_match_plain(spark):
    df = spark.createDataFrame(
        [(f"src{i % 3}", i % 2) for i in range(300)], "source string, sev int"
    )
    plain = {
        (r.source, r.sev): r.n
        for r in df.groupBy("source", "sev").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r.source, r.sev): r.n
        for r in agg.salted_counts(df, ["source", "sev"]).collect()
    }
    assert plain == salted


def test_ratelimit(spark):
    rows = [(f"h1", f"2024-01-01 00:00:{s:02d}", f"m{s}") for s in range(10)]
    df = spark.createDataFrame(rows, "host string, ts string, id string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = agg.ratelimit(df, ["host"], "ts", interval_seconds=5, burst=3,
                        tiebreak="id")
    assert out.filter("rl_pass").count() == 6  # 3 per 5s window × 2 windows


def test_last_message_repeated(spark):
    rows = [
        ("h", 1, "a"), ("h", 2, "a"), ("h", 3, "a"),
        ("h", 4, "b"), ("h", 5, "a"), ("h", 6, "a"),
    ]
    df = spark.createDataFrame(rows, "host string, seq int, msg string")
    out = agg.last_message_repeated(df, ["host"], "msg", ["seq"])
    got = [(r.msg, r.n_repeats) for r in out.orderBy("seq").collect()]
    assert got == [("a", 3), ("b", 1), ("a", 2)]


def test_perctile_batch(spark):
    df = spark.createDataFrame(
        [("k", float(v)) for v in range(1, 101)], "k string, v double"
    )
    row = agg.perctile_batch(df, ["k"], "v", [0.5, 0.95]).first()
    assert row.w_min == 1.0 and row.w_max == 100.0 and row.w_count == 100
    assert row.p50 == 50.0 and row.p95 == 95.0  # nearest-rank (disc)


def test_perctile_window(spark):
    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(1, 11)], "k string, t int, v double"
    )
    out = agg.perctile_window(df, "k", "v", "t", window_size=3, percentiles=[0.5])
    rows = {r.t: r for r in out.collect()}
    assert rows[1].w_count == 1 and rows[3].w_count == 3
    assert rows[10].w_min == 8.0 and rows[10].p50 == 9.0


def test_exec_throttles(spark):
    df = spark.createDataFrame(
        [("k", i) for i in range(1, 10)], "key string, seq int"
    )
    nth = agg.exec_every_nth(df, ["key"], ["seq"], 3)
    assert [r.seq for r in nth.orderBy("seq").collect()] == [3, 6, 9]


def test_mm_count_and_sequence(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, seq int"
    )
    out = agg.mm_count(df, ["k"], ["seq"])
    got = {(r.k, r.seq): r.mmcount for r in out.collect()}
    assert got == {("a", 1): 1, ("a", 2): 2, ("b", 3): 1}
    seq = agg.mm_sequence(df, ["seq"])
    assert [r.seq for r in seq.orderBy("seq").collect()] == [1, 2, 3]


def test_cidr_lookup_longest_prefix(spark):
    """mmdblookup analog: longest-prefix CIDR match (most specific
    net wins), nomatch default."""
    from rsyslog_spark.lookup import LookupTable, mmdblookup

    t = LookupTable(
        "nets", "cidr",
        [("10.0.0.0/8", "ten"), ("10.1.0.0/16", "ten-one"),
         ("192.168.0.0/16", "rfc1918")],
        nomatch="public",
    )
    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.9.9.9",), ("192.168.44.1",), ("8.8.8.8",),
         ("not-an-ip",)],
        "ip string",
    )
    got = [r.net for r in mmdblookup(df, t, "ip", "net").collect()]
    assert got == ["ten-one", "ten", "rfc1918", "public", "public"]


def test_mmkubernetes_enrichment(spark):
    """mmkubernetes (VERDICT r2 missing #5): filename → pod/namespace/
    container via the module's own default rulebase
    (DFLT_FILENAME_LNRULES), pod metadata joined broadcast — the
    API-server cache analog."""
    from rsyslog_spark.lookup import mmkubernetes

    did = "a" * 64
    df = spark.createDataFrame(
        [
            (f"/var/log/containers/web-5d4_prod_nginx-{did}.log", "m1"),
            (f"/var/log/containers/job-1_batch_runner-{did}.log", "m2"),
            ("/var/log/syslog", "m3"),  # not a container log
        ],
        "filename string, msg string",
    )
    meta = spark.createDataFrame(
        [("web-5d4", "prod", "uid-1", "team-a"),
         ("job-1", "batch", "uid-2", "team-b")],
        "pod_name string, namespace_name string, pod_uid string, "
        "team string",
    )
    rows = {r.msg: r for r in mmkubernetes(df, meta).collect()}
    r1 = rows["m1"]
    assert r1.k8s_pod_name == "web-5d4"
    assert r1.k8s_namespace_name == "prod"
    assert r1.k8s_container_name == "nginx"  # docker id split off
    assert r1.pod_uid == "uid-1" and r1.team == "team-a"
    assert rows["m2"].team == "team-b"
    r3 = rows["m3"]
    assert r3.k8s_pod_name is None and r3.pod_uid is None

    # the join must broadcast (dimension-sized metadata)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mmkubernetes(df, meta).explain()
    assert "BroadcastHashJoin" in buf.getvalue()


def test_sessionize_batch(spark):
    """Gap sessionization: new session when the inter-event gap exceeds
    gap_seconds; per-session start/end/count/duration."""
    from rsyslog_spark import aggregates as agg

    rows = [
        ("h1", "2024-01-01 00:00:00"), ("h1", "2024-01-01 00:00:30"),
        ("h1", "2024-01-01 00:02:00"),  # 90s gap > 60 → new session
        ("h1", "2024-01-01 00:02:10"),
        ("h2", "2024-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(rows, "host string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {(r.host, r.session_id): r for r in agg.sessionize(
        df, "host", "ts", gap_seconds=60
    ).collect()}
    s11 = got[("h1", 1)]
    assert s11.n_events == 2 and s11.duration_secs == 30
    s12 = got[("h1", 2)]
    assert s12.n_events == 2 and s12.duration_secs == 10
    assert s12.start_ep - s11.end_ep == 90
    assert got[("h2", 1)].n_events == 1
    assert len(got) == 3
