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

    # replaying batch 2 WITHOUT a batch_id is NOT idempotent for sum
    # (at-least-once adds); min/max converge
    got = upsert_aggregate(b2, path, ["sender"], merge)
    state = {r.sender: r for r in got.collect()}
    assert state["h1"].first_seen == 100 and state["h1"].last_seen == 110


def test_upsert_batch_id_makes_replay_noop(spark, tmp_path):
    path = str(tmp_path / "state")
    merge = {"n": "sum"}
    b = spark.createDataFrame([("k1", 5), ("k2", 2)], "key string, n long")
    upsert_aggregate(b, path, ["key"], merge, batch_id="epoch-1")
    got = upsert_aggregate(b, path, ["key"], merge, batch_id="epoch-1")
    state = {r.key: r.n for r in got.collect()}
    assert state == {"k1": 5, "k2": 2}  # true no-op on replay
    got = upsert_aggregate(b, path, ["key"], merge, batch_id="epoch-2")
    state = {r.key: r.n for r in got.collect()}
    assert state == {"k1": 10, "k2": 4}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    import os

    path = str(tmp_path / "state")
    big = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(200)], "key string, n long"
    )
    upsert_aggregate(big, path, ["key"], {"n": "sum"}, num_buckets=8)
    mtimes = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("_bucket=")
    }
    assert len(mtimes) == 8
    import time

    time.sleep(1.1)
    one = spark.createDataFrame([("key0", 7)], "key string, n long")
    upsert_aggregate(one, path, ["key"], {"n": "sum"}, num_buckets=8)
    changed = [
        d for d in mtimes
        if os.path.getmtime(os.path.join(path, d)) != mtimes[d]
    ]
    assert len(changed) == 1  # only key0's bucket was rewritten
    got = upsert_aggregate(
        spark.createDataFrame([("key1", 0)], "key string, n long"),
        path, ["key"], {"n": "sum"}, num_buckets=8,
    )
    state = {r.key: r.n for r in got.collect()}
    assert state["key0"] == 8 and len(state) == 200


def test_upsert_recovers_interrupted_swap(spark, tmp_path):
    import os
    import shutil

    path = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(50)], "key string, n long"
    )
    upsert_aggregate(b, path, ["key"], {"n": "sum"}, num_buckets=4)
    # simulate a crash mid-swap: one bucket parked in .bak, gone from state
    bak = path + ".bak"
    os.makedirs(bak, exist_ok=True)
    victim = next(d for d in os.listdir(path) if d.startswith("_bucket="))
    os.rename(os.path.join(path, victim), os.path.join(bak, victim))
    # next upsert must first restore the parked bucket, losing nothing
    got = upsert_aggregate(
        spark.createDataFrame([("key0", 1)], "key string, n long"),
        path, ["key"], {"n": "sum"}, num_buckets=4,
    )
    assert got.count() == 50
    assert not os.path.isdir(bak)


def test_upsert_midswap_crash_rolls_back_then_replays_once(spark, tmp_path):
    """Journaled swap: a crash AFTER some buckets swapped but BEFORE
    the batch marker commits must roll back, so the replay applies
    exactly once (no partial-swap double counting)."""
    import json
    import os
    import shutil

    path = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(f"key{i}", 10) for i in range(40)], "key string, n long"
    )
    upsert_aggregate(b0, path, ["key"], {"n": "sum"}, num_buckets=4,
                     batch_id="e0")
    # simulate: batch e1 swapped bucket 0's new data in, parked the old
    # copy, wrote the journal — then crashed before the marker
    victim = "_bucket=0"
    bak = path + ".bak"
    os.makedirs(bak, exist_ok=True)
    with open(os.path.join(bak, "_PENDING"), "w") as fh:
        json.dump([0], fh)
    os.rename(os.path.join(path, victim), os.path.join(bak, victim))
    shutil.copytree(os.path.join(bak, victim), os.path.join(path, victim))
    # (the copied dir stands in for e1's partially-applied new data)
    b1 = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(40)], "key string, n long"
    )
    got = upsert_aggregate(b1, path, ["key"], {"n": "sum"}, num_buckets=4,
                           batch_id="e1")
    state = {r.key: r.n for r in got.collect()}
    # rollback discarded the partial e1 data; replay added exactly once
    assert all(v == 11 for v in state.values()), state
    assert len(state) == 40


def test_upsert_crash_after_marker_rolls_forward(spark, tmp_path):
    """Crash window between marker commit and .bak cleanup: the marker
    proves the swap completed, so recovery must roll FORWARD (keep the
    new buckets, discard the stale parked copies). Rolling back here
    would silently lose the batch — the marker check would then skip
    the replay (ADVICE r2, sinks.py commit ordering)."""
    import json
    import os
    import shutil

    path = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(f"key{i}", 10) for i in range(40)], "key string, n long"
    )
    upsert_aggregate(b0, path, ["key"], {"n": "sum"}, num_buckets=4,
                     batch_id="e0")
    b1 = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(40)], "key string, n long"
    )
    upsert_aggregate(b1, path, ["key"], {"n": "sum"}, num_buckets=4,
                     batch_id="e1")
    # simulate the crash: e1 fully committed (marker exists, state has
    # the merged buckets) but .bak with the PRE-e1 copies + manifest
    # was never removed
    bak = path + ".bak"
    os.makedirs(bak, exist_ok=True)
    with open(os.path.join(bak, "_PENDING"), "w") as fh:
        json.dump({"touched": [0, 1, 2, 3], "batch_id": "e1"}, fh)
    for d in os.listdir(path):
        if d.startswith("_bucket="):  # park stale pre-batch stand-ins
            shutil.copytree(os.path.join(path, d), os.path.join(bak, d))
    # replay of e1 after the crash: marker short-circuits; recovery
    # must NOT have rolled the committed buckets back first
    got = upsert_aggregate(b1, path, ["key"], {"n": "sum"}, num_buckets=4,
                           batch_id="e1")
    state = {r.key: r.n for r in got.collect()}
    assert all(v == 11 for v in state.values()), state
    assert len(state) == 40
    assert not os.path.isdir(bak)


def test_upsert_num_buckets_change_rebuckets(spark, tmp_path):
    """Changing num_buckets between calls must not split a key across
    two moduli (ADVICE r2): the state is transparently re-bucketed."""
    import json
    import os

    path = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(100)], "key string, n long"
    )
    upsert_aggregate(b0, path, ["key"], {"n": "sum"}, num_buckets=16)
    with open(path + ".meta") as fh:
        assert json.load(fh)["num_buckets"] == 16
    # same keys, different modulus: without re-bucketing, key0's old
    # row (bucket id mod 16) is invisible to the mod-4 pruned read and
    # the key duplicates
    b1 = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(100)], "key string, n long"
    )
    got = upsert_aggregate(b1, path, ["key"], {"n": "sum"}, num_buckets=4)
    state = {r.key: r.n for r in got.collect()}
    assert len(state) == 100 and all(v == 2 for v in state.values())
    with open(path + ".meta") as fh:
        assert json.load(fh)["num_buckets"] == 4
    dirs = {d for d in os.listdir(path) if d.startswith("_bucket=")}
    assert dirs == {f"_bucket={i}" for i in range(4)}
    # and the pruned path still works at the new modulus
    got = upsert_aggregate(
        spark.createDataFrame([("key0", 5)], "key string, n long"),
        path, ["key"], {"n": "sum"}, num_buckets=4,
    )
    state = {r.key: r.n for r in got.collect()}
    assert state["key0"] == 7 and len(state) == 100


def test_upsert_migrates_legacy_flat_layout(spark, tmp_path):
    """A state dir from the pre-bucketing layout is merged, not
    destroyed."""
    path = str(tmp_path / "state")
    old = spark.createDataFrame(
        [("h1", 5), ("h2", 2)], "sender string, n long"
    )
    old.write.mode("overwrite").parquet(path)  # flat legacy layout
    new = spark.createDataFrame([("h1", 3), ("h3", 1)],
                                "sender string, n long")
    got = upsert_aggregate(new, path, ["sender"], {"n": "sum"},
                           num_buckets=4)
    state = {r.sender: r.n for r in got.collect()}
    assert state == {"h1": 8, "h2": 2, "h3": 1}


def test_upsert_full_rewrite_crash_before_marker_replays_once(spark, tmp_path):
    """Exactly-once for the FULL-REWRITE path (code-review r3 #2): a
    crash after the first write's rename but before the batch marker
    must roll the state back to ABSENCE so the replay applies once —
    without the journal, the replay would double every sum."""
    import json
    import os

    path = str(tmp_path / "state")
    b = spark.createDataFrame([("k1", 5), ("k2", 2)], "key string, n long")
    upsert_aggregate(b, path, ["key"], {"n": "sum"}, batch_id="e0")
    # simulate: rename completed, marker never written — re-create the
    # journal and delete the marker (state currently holds e0's data)
    with open(path + ".pending_full", "w") as fh:
        json.dump({"batch_id": "e0", "had_old": False}, fh)
    os.remove(os.path.join(path + ".batches", "e0"))
    got = upsert_aggregate(b, path, ["key"], {"n": "sum"}, batch_id="e0")
    state = {r.key: r.n for r in got.collect()}
    assert state == {"k1": 5, "k2": 2}, state  # NOT doubled


def test_upsert_full_rewrite_crash_after_marker_rolls_forward(spark, tmp_path):
    """...and when the marker DID commit, recovery keeps the new state
    (replay is a no-op via the marker)."""
    import json

    path = str(tmp_path / "state")
    b = spark.createDataFrame([("k1", 5)], "key string, n long")
    upsert_aggregate(b, path, ["key"], {"n": "sum"}, batch_id="e0")
    with open(path + ".pending_full", "w") as fh:
        json.dump({"batch_id": "e0", "had_old": False}, fh)
    got = upsert_aggregate(b, path, ["key"], {"n": "sum"}, batch_id="e0")
    assert {r.key: r.n for r in got.collect()} == {"k1": 5}


def test_upsert_rebucket_migration_crash_rolls_back(spark, tmp_path):
    """Re-bucket migration (full rewrite with had_old): a crash between
    rename and marker restores the PARKED pre-batch state."""
    import json
    import os
    import shutil

    path = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(f"k{i}", 1) for i in range(40)], "key string, n long"
    )
    upsert_aggregate(b0, path, ["key"], {"n": "sum"}, num_buckets=8,
                     batch_id="e0")
    # simulate a crashed re-bucket: park the current state as .old,
    # put a half-written replacement at path, journal without marker
    os.rename(path, path + ".old")
    shutil.copytree(path + ".old", path)
    shutil.rmtree(
        os.path.join(path, os.listdir(path + ".old")[0]),
        ignore_errors=True,
    )
    with open(path + ".pending_full", "w") as fh:
        json.dump({"batch_id": "e1", "had_old": True}, fh)
    b1 = spark.createDataFrame([("k0", 1)], "key string, n long")
    got = upsert_aggregate(b1, path, ["key"], {"n": "sum"}, num_buckets=8,
                           batch_id="e1")
    state = {r.key: r.n for r in got.collect()}
    assert len(state) == 40 and state["k0"] == 2  # nothing lost, applied once


def test_upsert_meta_less_bucketed_state_migrates(spark, tmp_path):
    """A bucketed state WITHOUT .meta (pre-upgrade) has an unknown
    modulus: the next call must migrate it with a full merge rewrite
    (code-review r3 #3) instead of pruning with the caller's modulus."""
    import json
    import os

    path = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(f"key{i}", 1) for i in range(100)], "key string, n long"
    )
    upsert_aggregate(b0, path, ["key"], {"n": "sum"}, num_buckets=16)
    os.remove(path + ".meta")  # simulate a round-2 state
    # different modulus against the meta-less state: keys must merge,
    # never split across moduli
    got = upsert_aggregate(
        spark.createDataFrame([(f"key{i}", 1) for i in range(100)],
                              "key string, n long"),
        path, ["key"], {"n": "sum"}, num_buckets=4,
    )
    state = {r.key: r.n for r in got.collect()}
    assert len(state) == 100 and all(v == 2 for v in state.values())
    with open(path + ".meta") as fh:
        assert json.load(fh)["num_buckets"] == 4
    dirs = {d for d in os.listdir(path) if d.startswith("_bucket=")}
    assert dirs == {f"_bucket={i}" for i in range(4)}
