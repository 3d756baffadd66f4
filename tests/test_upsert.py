"""Idempotent aggregate upsert (Iceberg-MERGE analog / omsendertrack)."""

from __future__ import annotations

from rsyslog_spark.sinks import upsert_aggregate


def test_upsert_aggregate(spark, tmp_path):
    path = str(tmp_path / "sender_state")
    b1 = spark.createDataFrame(
        [("h1", 5, 100, 104), ("h2", 2, 101, 102)],
        "sender string, n_msgs long, first_seen long, last_seen long",
    )
    merge = {"n_msgs": "sum", "first_seen": "min", "last_seen": "max"}
    got = upsert_aggregate(b1, path, ["sender"], merge)
    assert got.count() == 2

    # batch 2: existing sender grows, new sender appears
    b2 = spark.createDataFrame(
        [("h1", 3, 105, 110), ("h3", 1, 106, 106)],
        "sender string, n_msgs long, first_seen long, last_seen long",
    )
    got = upsert_aggregate(b2, path, ["sender"], merge)
    state = {r.sender: r for r in got.collect()}
    assert state["h1"].n_msgs == 8
    assert state["h1"].first_seen == 100 and state["h1"].last_seen == 110
    assert state["h3"].n_msgs == 1
    assert len(state) == 3

    # replaying batch 2 is NOT idempotent for sum (at-least-once adds);
    # but the merge itself converges: min/max stay fixed
    got = upsert_aggregate(b2, path, ["sender"], merge)
    state = {r.sender: r for r in got.collect()}
    assert state["h1"].first_seen == 100 and state["h1"].last_seen == 110
