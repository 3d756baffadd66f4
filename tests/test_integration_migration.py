"""End-to-end 'reference user migrates' scenario: mixed-dialect corpus
through device fixups → legacy conf routing → script routing → lookup
enrichment → template rendering → sinks + lineage, in one pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F

from rsyslog_spark import mm
from rsyslog_spark.lineage import run_with_lineage
from rsyslog_spark.lookup import LookupTable
from rsyslog_spark.parsing import parse
from rsyslog_spark.parsing.devices import parser_chain, pmciscoios, pmlastmsg
from rsyslog_spark.rules import Router
from rsyslog_spark.rules.compiler import Env
from rsyslog_spark.templates import compile_template

LINES = [
    "<189>1001: rtr1: *Mar  6 16:57:54: %SYS-5-CONFIG_I: Configured by admin",
    "<38>Apr  4 03:06:12 gate sshd[211]: Failed password for invalid user",
    "<38>Apr  4 03:06:13 gate sshd[211]: Failed password for invalid user",
    "<46>Nov  2 00:00:00 relay last message repeated 9 times",
    '<165>1 2024-10-11T22:14:15Z web01 nginx 77 ID9 - @cee: {"status":"502","path":"/api"}',
    "<13>Oct 11 22:14:19 web01 cron[1]: job ok",
]

SCRIPT = """
set $.zone = lookup("zones", $hostname);
if $programname startswith "%SYS" then { action(name="cisco_events") }
if $!status == "502" then { action(name="errors_5xx") stop }
if $msg contains "Failed password" then { action(name="auth_fail") }
action(name="archive")
"""


def test_full_migration_pipeline(spark, tmp_path):
    df = spark.createDataFrame(
        [(ln, [ord(c) for c in ln]) for ln in LINES],
        "line string, tokens array<int>",
    )
    parsed = parser_chain(parse(df), [pmciscoios, pmlastmsg])
    parsed = mm.mmjsonparse(parsed)

    env = Env()
    env.lookups["zones"] = LookupTable(
        "zones", "string",
        [("rtr1", "net"), ("gate", "dmz"), ("web01", "web")],
        nomatch="unknown",
    )
    router = Router(SCRIPT, env)
    snap = run_with_lineage(router, parsed, str(tmp_path / "out"))

    assert snap["rows_in"] == 6
    assert snap["routed_cisco_events"] == 1
    assert snap["routed_errors_5xx"] == 1
    assert snap["routed_auth_fail"] == 2
    assert snap["routed_archive"] == 5  # all except the stopped 5xx row

    # enrichment visible downstream
    routed = router.apply(parsed, keep_locals=True)
    zones = {r.hostname: r.local_zone for r in routed.collect()}
    assert zones["rtr1"] == "net" and zones["web01"] == "web"
    assert zones.get("relay", "unknown") == "unknown"

    # render an output template over a sink slice
    sink = spark.read.parquet(str(tmp_path / "out" / "auth_fail"))
    line = compile_template(
        "%timereported% %hostname% %syslogtag%%msg%", env
    )
    rendered = [r.l for r in sink.select(line.alias("l")).collect()]
    assert all("gate sshd[211]:" in x for x in rendered)

    # token pass-through invariant survives the whole pipeline
    orig = {r.line: r.tokens for r in df.collect()}
    for r in routed.collect():
        assert r.tokens == orig[r.line]
