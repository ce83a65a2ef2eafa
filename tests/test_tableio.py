"""SnapshotStore: atomic commits, append vs replace, time travel."""

import json

from ccr_web_crawler_spark.sources.tableio import APPEND, REPLACE, SnapshotStore


def test_commit_read_roundtrip(spark, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    v1 = store.commit(0, {"t": (df, APPEND)})
    assert v1 == 1
    got = store.read(spark, "t")
    assert sorted((r.id, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_append_accumulates_replace_overwrites(spark, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    a = spark.createDataFrame([(1,)], "id int")
    b = spark.createDataFrame([(2,)], "id int")
    store.commit(0, {"acc": (a, APPEND), "work": (a, REPLACE)})
    store.commit(1, {"acc": (b, APPEND), "work": (b, REPLACE)})
    assert sorted(r.id for r in store.read(spark, "acc").collect()) == [1, 2]
    assert [r.id for r in store.read(spark, "work").collect()] == [2]


def test_time_travel(spark, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    store.commit(0, {"t": (spark.createDataFrame([(1,)], "id int"), APPEND)})
    store.commit(1, {"t": (spark.createDataFrame([(2,)], "id int"), APPEND)})
    assert [r.id for r in store.read(spark, "t", version=1).collect()] == [1]
    assert store.manifest(1)["round"] == 0
    assert store.manifest()["parent"] == 1


def test_torn_manifest_never_visible(spark, tmp_path):
    """A crash before the _current swing leaves the old snapshot live."""
    store = SnapshotStore(tmp_path / "db")
    store.commit(0, {"t": (spark.createDataFrame([(1,)], "id int"), APPEND)})
    # simulate a crashed writer: orphan snapshot file without pointer swing
    orphan = store.root / "snapshots" / "v000099.json"
    orphan.write_text(json.dumps({"version": 99, "tables": {"t": {"files": ["nope"]}}}))
    assert store.current_version() == 1
    assert [r.id for r in store.read(spark, "t").collect()] == [1]


def test_lineage_records_round(spark, tmp_path):
    store = SnapshotStore(tmp_path / "db")
    store.commit(7, {"t": (spark.createDataFrame([(1,)], "id int"), APPEND)})
    lineage = store.manifest()["tables"]["t"]["lineage"]
    assert all(v["round"] == 7 for v in lineage.values()) and lineage


def test_rollback_swings_pointer_and_branches(spark, tmp_path):
    """Iceberg rollback: the pointer moves back, reads see the old
    state, and the next commit branches WITHOUT overwriting the
    abandoned snapshots."""
    import pytest

    store = SnapshotStore(tmp_path / "db")
    store.commit(0, {"t": (spark.createDataFrame([(1,)], "id int"), APPEND)})
    store.commit(1, {"t": (spark.createDataFrame([(2,)], "id int"), APPEND)})
    store.commit(2, {"t": (spark.createDataFrame([(3,)], "id int"), APPEND)})
    assert store.current_version() == 3
    store.rollback(1)
    assert store.current_version() == 1
    assert sorted(r.id for r in store.read(spark, "t").collect()) == [1]
    # commit on the rolled-back state: new version numbers continue past
    # the abandoned branch (v2/v3 stay intact on disk)
    v = store.commit(9, {"t": (spark.createDataFrame([(9,)], "id int"), APPEND)})
    assert v == 4
    assert sorted(r.id for r in store.read(spark, "t").collect()) == [1, 9]
    assert store.manifest(4)["parent"] == 1
    assert store.manifest(3)["tables"]  # abandoned snapshot untouched
    with pytest.raises(ValueError):
        store.rollback(99)
