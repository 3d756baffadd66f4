"""dynstats cardinality cap, lookup reload-on-batch, exec_template."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from rsyslog_spark import aggregates as agg
from rsyslog_spark.lookup import ReloadingLookup
from rsyslog_spark.rules import Router
from rsyslog_spark.rules.compiler import Env


def test_dyn_stats_capped(spark):
    rows = [(f"k{i % 5}",) for i in range(40)] + [("rare1",), ("rare2",)]
    df = spark.createDataFrame(rows, "key string")
    out = agg.dyn_stats_capped(df, ["key"], max_cardinality=5)
    got = {r.key: r.n for r in out.collect()}
    assert len(got) == 6  # 5 kept + overflow
    assert got["_overflow_"] == 2  # rare1+rare2 merged
    assert sum(got.values()) == 42


def test_reloading_lookup(spark, tmp_path):
    p = str(tmp_path / "tbl.lkp_tbl")
    doc = {"version": 1, "nomatch": "none", "type": "string",
           "table": [{"index": "a", "value": "v1"}]}
    with open(p, "w") as fh:
        json.dump(doc, fh)
    rl = ReloadingLookup("t", p)
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {r.k: r.v for r in rl.enrich(df, "k", "v").collect()}
    assert got == {"a": "v1", "b": "none"}
    # table file changes → next batch sees the new mapping (reloadOnHUP)
    doc["table"][0]["value"] = "v2"
    with open(p, "w") as fh:
        json.dump(doc, fh)
    got = {r.k: r.v for r in rl.enrich(df, "k", "v").collect()}
    assert got["a"] == "v2"
    # broken file → stub (lookupReloadOrStub)
    with open(p, "w") as fh:
        fh.write("{broken")
    got = {r.k: r.v for r in rl.enrich(df, "k", "v").collect()}
    assert got == {"a": "", "b": ""}


def test_exec_template_in_script(spark):
    env = Env()
    env.templates["mytpl"] = "prog=%programname% sev=%syslogseverity%"
    script = 'set $.line = exec_template("mytpl"); action(name="out")'
    df = spark.createDataFrame(
        [("cron", 5)], "programname string, severity int"
    )
    routed = Router(script, env).apply(df, keep_locals=True)
    assert routed.first().local_line == "prog=cron sev=5"
