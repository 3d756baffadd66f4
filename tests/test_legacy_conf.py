"""Legacy rsyslog.conf translator (classic selector/propfilt lines)."""

from __future__ import annotations

from rsyslog_spark import flagship
from rsyslog_spark.rules.legacy import LegacyRouter

CONF = r"""
# classic config, straight out of a reference deployment
$template Tradition,"%timereported% %hostname% %syslogtag%%msg%"

mail,daemon.warning      /var/log/facilities
:msg, contains, "k=7"    /var/log/k7
:programname, isequal, "error"   @@central.example.com:514
*.=debug                 ~
*.*                      /var/log/catchall
"""


def test_legacy_conf_routes(spark, sf_dir):
    parsed = flagship.build_parsed(spark, sf_dir)
    r = LegacyRouter(CONF)
    counts = dict(r.route_counts(parsed).collect())
    # oracle-style independent expectations from the corpus arithmetic:
    import duckdb

    sev = ("CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 5 "
           "WHEN 'signup' THEN 6 WHEN 'view' THEN 6 ELSE 7 END")
    q = duckdb.sql(f"""
        SELECT
          count(*) FILTER (WHERE (user_id % 24) IN (2,3) AND {sev} <= 4),
          count(*) FILTER (WHERE CAST(json_extract(props,'$.k') AS VARCHAR)
                           LIKE '7%'),
          count(*) FILTER (WHERE event_type = 'error'),
          count(*)
        FROM '{'/root/testdata/sf0.001'}/events.parquet'
    """).fetchone()
    assert counts["var_log_facilities"] == q[0]
    assert counts["var_log_k7"] == q[1]
    assert counts["fwd_tcp_central_example_com_514"] == q[2]
    # no debug severity in the corpus... click→7 IS debug; the `~`
    # discard removes them from the catchall
    assert counts["var_log_catchall"] < q[3]
    assert r.templates["Tradition"].startswith("%timereported%")


def test_legacy_discard_semantics(spark):
    conf = """
*.=err  ~
*.*     /var/log/rest
"""
    df = spark.createDataFrame(
        [(0, 3), (0, 6), (4, 3)], "facility int, severity int"
    )
    counts = dict(LegacyRouter(conf).route_counts(df).collect())
    assert counts["var_log_rest"] == 1  # both err rows discarded


def test_legacy_continuation_stop(spark):
    conf = """
:msg, contains, "secret"   /var/log/secure
& stop
*.*                        /var/log/all
"""
    df = spark.createDataFrame(
        [(1, 5, "a secret thing"), (1, 5, "public")],
        "facility int, severity int, msg string",
    )
    counts = dict(LegacyRouter(conf).route_counts(df).collect())
    assert counts["var_log_secure"] == 1
    assert counts["var_log_all"] == 1  # secret row stopped


def test_bsd_host_tag_blocks(spark):
    """Classic sysklogd +host/-host/!prog block scoping
    (grammar.y:85-86 tokens; rejected by modern rsyslog rsconf.c:848 —
    translated here with original sysklogd semantics)."""
    from pyspark.sql import functions as F

    from rsyslog_spark.rules.legacy import LegacyRouter

    df = spark.createDataFrame(
        [
            (13, "HOST7", "sshd", "a"),   # pri 13 = user.notice
            (13, "host7", "cron", "b"),
            (13, "host9", "sshd", "c"),
            (13, "host9", "cron", "d"),
        ],
        "pri int, hostname string, programname string, msg string",
    ).withColumns(
        {
            "facility": (F.col("pri") / 8).cast("int"),
            "severity": F.col("pri") % 8,
        }
    )
    conf = """
+host7
*.*     /var/log/from_host7
+*
-host7
*.*     /var/log/not_host7
+*
!sshd
*.*     /var/log/sshd_only
!-sshd
*.*     /var/log/not_sshd
!*
*.*     /var/log/all
"""
    counts = {
        r.sink: r.n
        for r in LegacyRouter(conf).route_counts(df).collect()
    }
    assert counts["var_log_from_host7"] == 2  # case-insensitive host match
    assert counts["var_log_not_host7"] == 2
    assert counts["var_log_sshd_only"] == 2
    assert counts["var_log_not_sshd"] == 2
    assert counts["var_log_all"] == 4
