"""Per-source ruleset binding (BoundRouter)."""

from __future__ import annotations

from rsyslog_spark.rules.router import BoundRouter

SCRIPT = """
ruleset(name="web") {
    if $msg contains "GET" then { action(name="web_access") }
    action(name="web_all")
}
ruleset(name="db") {
    if $syslogseverity <= 3 then { action(name="db_errors") }
    action(name="db_all")
}
ruleset(name="fallback") {
    action(name="other")
}
"""


def test_bound_router(spark):
    df = spark.createDataFrame(
        [
            ("nginx", 6, "GET /index"),
            ("nginx", 6, "POST /form"),
            ("pgsql", 2, "fatal error"),
            ("pgsql", 6, "checkpoint done"),
            ("mystery", 6, "who am I"),
        ],
        "source string, severity int, msg string",
    )
    r = BoundRouter(
        SCRIPT,
        bindings={"nginx": "web", "pgsql": "db"},
        default="fallback",
    )
    counts = dict(r.route_counts(df).collect())
    assert counts["web_access"] == 1
    assert counts["web_all"] == 2
    assert counts["db_errors"] == 1
    assert counts["db_all"] == 2
    assert counts["other"] == 1  # only the unbound source


def test_bound_router_shared_sink_merges(spark):
    script = """
ruleset(name="a") { action(name="common") }
ruleset(name="b") { action(name="common") }
"""
    df = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",)], "source string"
    )
    r = BoundRouter(script, bindings={"s1": "a", "s2": "b"})
    counts = dict(r.route_counts(df).collect())
    assert counts["common"] == 2  # s1 via a, s2 via b, s3 unbound
