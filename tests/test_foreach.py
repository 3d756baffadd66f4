"""foreach statement: per-element action semantics (ruleset.c:310-401)."""

from __future__ import annotations

import pyspark.sql.functions as F

from rsyslog_spark.rules import Router


SCRIPT = """
foreach ($.w in split($msg, " ")) do {
    if $.w contains "=" then { action(name="kv") }
}
action(name="all")
"""


def test_foreach_counts_per_element(spark):
    df = spark.createDataFrame(
        [("a=1 b=2 plain",), ("nothing here",), ("x=9",)], "msg string"
    )
    r = Router(SCRIPT)
    counts = dict(r.route_counts(df).collect())
    assert counts["kv"] == 3  # a=1, b=2, x=9 — per element, not per row
    assert counts["all"] == 3


def test_foreach_apply_boolean(spark):
    df = spark.createDataFrame(
        [("a=1 b=2 plain",), ("nothing here",)], "msg string"
    )
    routed = Router(SCRIPT).apply(df)
    got = {r.msg: r.route_kv for r in routed.collect()}
    assert got["a=1 b=2 plain"] is True
    assert got["nothing here"] is False


def test_foreach_write_explodes(spark, tmp_path):
    df = spark.createDataFrame([("a=1 b=2 plain",)], "msg string")
    out = Router(SCRIPT).write_sinks(df, str(tmp_path))
    kv = spark.read.parquet(out["kv"])
    assert sorted(r.item for r in kv.collect()) == ["a=1", "b=2"]


def test_foreach_respects_stop_and_condition(spark):
    script = """
if $msg startswith "skip" then stop
foreach ($.w in split($msg, " ")) do {
    if $.w == "hit" then { action(name="hits") }
}
"""
    df = spark.createDataFrame(
        [("hit or hit",), ("skip hit",), ("none",)], "msg string"
    )
    counts = dict(Router(script).route_counts(df).collect())
    assert counts["hits"] == 2  # two in row 1; row 2 stopped
