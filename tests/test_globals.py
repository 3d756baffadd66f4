"""`$/` global variables → window aggregates (rules/globals.py)."""

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.rules.compiler import Env
from rsyslog_spark.rules.router import Router


@pytest.fixture()
def ev(spark):
    return spark.createDataFrame(
        [(i, f"h{i % 3}", i % 8) for i in range(12)],
        "event_id long, hostname string, severity long",
    )


def _env():
    return Env(props={
        "$hostname": ("hostname", "S"),
        "$syslogseverity": ("severity", "N"),
    })


def test_accumulate_and_last_set(ev):
    env = _env()
    script = """
    if $syslogseverity <= 3 then set $/errs = $/errs + 1;
    set $/total = $/total + 1;
    if $syslogseverity <= 3 then set $/last_err_host = $hostname;
    action(name="out")
    """
    r = Router(script, env, globals_order="event_id")
    out = (
        r.apply(ev)
        .withColumn("errs", env.resolve("$/errs")[0])
        .withColumn("total", env.resolve("$/total")[0])
        .withColumn("leh", env.resolve("$/last_err_host")[0])
        .orderBy("event_id")
        .collect()
    )
    # severities cycle 0..7; rows 0-3 and 8-11 have sev<=3
    assert [row["total"] for row in out] == list(range(1, 13))
    assert [row["errs"] for row in out] == [1, 2, 3, 4, 4, 4, 4, 4, 5, 6, 7, 8]
    # last host whose severity was <=3, as of each row (inclusive)
    assert out[3]["leh"] == "h0" and out[7]["leh"] == "h0"
    assert out[8]["leh"] == "h2" and out[11]["leh"] == "h2"


def test_read_after_write_same_row_inclusive(ev):
    env = _env()
    script = """
    set $/n = $/n + 1;
    set $.snap = cstr($/n);
    action(name="out")
    """
    r = Router(script, env, globals_order="event_id")
    out = r.apply(ev, keep_locals=True).orderBy("event_id").collect()
    # a read after the set sees the updated (inclusive) value
    assert [row["local_snap"] for row in out] == [str(i) for i in range(1, 13)]


def test_worker_sharded_store(ev):
    env = _env()
    script = 'set $/n = $/n + 1; action(name="out")'
    r = Router(script, env, globals_order="event_id",
               globals_worker="hostname")
    out = (
        r.apply(ev).withColumn("n", env.resolve("$/n")[0])
        .orderBy("event_id").collect()
    )
    # per-hostname stores: h0,h1,h2 each count 1..4 interleaved
    assert [row["n"] for row in out] == [1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4]


def test_never_set_global_reads_empty(ev):
    env = _env()
    r = Router('action(name="out")', env, globals_order="event_id")
    out = r.apply(ev).withColumn("g", env.resolve("$/nope")[0]).first()
    assert out["g"] == ""


def test_conditional_accumulate_with_stop(ev):
    # rows stopped before the set must not contribute
    env = _env()
    script = """
    if $syslogseverity >= 6 then stop;
    set $/n = $/n + 1;
    action(name="out")
    """
    r = Router(script, env, globals_order="event_id")
    out = (
        r.apply(ev).withColumn("n", env.resolve("$/n")[0])
        .orderBy("event_id").collect()
    )
    # sev 6,7 rows (ids 6,7) don't bump the counter
    assert [row["n"] for row in out] == [1, 2, 3, 4, 5, 6, 6, 6, 7, 8, 9, 10]


def test_errors(ev):
    env = _env()
    with pytest.raises(ValueError, match="globals_order"):
        Router("set $/x = $/x + 1;", _env())
    with pytest.raises(ValueError, match="write-then-read|read"):
        Router('set $.y = cstr($/x); set $/x = $/x + 1;', _env(),
               globals_order="event_id")
    with pytest.raises(ValueError, match="unsupported"):
        # cross-global RHS is not window-expressible
        Router("set $/a = 1; set $/b = $/a + 1;", _env(),
               globals_order="event_id")
    with pytest.raises(ValueError, match="unsupported"):
        # multiplicative self-reference needs a sequential fold
        Router("set $/a = $/a + 1; set $/a = $/a * 2;", _env(),
               globals_order="event_id")


def test_multiple_sets_reassign_resets_accumulator(ev):
    """r5 continuation: multiple statements per name — an assign after
    an accumulate resets the segment base every row it fires."""
    env = _env()
    script = """
    set $/x = $/x + 1;
    set $.mid = cstr($/x);
    if $syslogseverity == 7 then set $/x = 100;
    action(name="out")
    """
    r = Router(script, env, globals_order="event_id")
    out = (
        r.apply(ev, keep_locals=True)
        .withColumn("x", env.resolve("$/x")[0])
        .orderBy("event_id").collect()
    )
    # sev cycles 0..7; rows 7 (sev 7) assign 100. Before that,
    # accumulate 1/row: rows 0..6 → 1..7; row 7: acc → 8 then 100;
    # rows 8..11 accumulate from 100 → 101..104.
    assert [row["x"] for row in out] == [
        1, 2, 3, 4, 5, 6, 7, 100, 101, 102, 103, 104,
    ]
    # the mid-row read sees the accumulate but not the later assign
    assert [row["local_mid"] for row in out] == [
        "1", "2", "3", "4", "5", "6", "7", "8",
        "101", "102", "103", "104",
    ]


def test_unset_global_clears_until_next_write(ev):
    env = _env()
    script = """
    if $syslogseverity <= 3 then set $/h = $hostname;
    if $syslogseverity == 5 then unset $/h;
    action(name="out")
    """
    r = Router(script, env, globals_order="event_id")
    out = (
        r.apply(ev).withColumn("h", env.resolve("$/h")[0])
        .orderBy("event_id").collect()
    )
    # sev = id % 8: ids 0-3 set h0..h0 (hosts h0,h1,h2,h0); id 5 (sev
    # 5) unsets; ids 6,7 still unset (reads ""); ids 8-11 (sev 0-3)
    # set again h2,h0,h1,h2
    assert [row["h"] for row in out] == [
        "h0", "h1", "h2", "h0", "h0", "", "", "",
        "h2", "h0", "h1", "h2",
    ]


def test_unset_then_accumulate_restarts_from_zero(ev):
    env = _env()
    script = """
    if $syslogseverity == 4 then unset $/n;
    set $/n = $/n + 1;
    action(name="out")
    """
    r = Router(script, env, globals_order="event_id")
    out = (
        r.apply(ev).withColumn("n", env.resolve("$/n")[0])
        .orderBy("event_id").collect()
    )
    # unset fires on ids 4 (sev 4) BEFORE that row's accumulate:
    # counts restart at 1 there; no other sev-4 row until... sev
    # cycles 0..7 so only id 4 in 12 rows.
    assert [row["n"] for row in out] == [
        1, 2, 3, 4, 1, 2, 3, 4, 5, 6, 7, 8,
    ]


def test_accumulate_numeric_expression(ev):
    env = _env()
    script = 'set $/sev_sum = $/sev_sum + $syslogseverity; action(name="o")'
    r = Router(script, env, globals_order="event_id")
    out = (
        r.apply(ev).withColumn("s", env.resolve("$/sev_sum")[0])
        .orderBy("event_id").collect()
    )
    import itertools

    expect = list(itertools.accumulate(i % 8 for i in range(12)))
    assert [row["s"] for row in out] == expect
