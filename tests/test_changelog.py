"""Row-level changefeed (sources/warehouse.read_deleted_rows /
read_changelog): the delete complement of read_changes' append feed —
together the Iceberg-v2 changelog-scan analogue. An update_where shows
as delete + insert; applying inserts then deletes to the since-state
reconstructs the to-state."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.sources import TableMeta, Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _table(spark, wh, name="t"):
    rel = wh.relation("s", name)
    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 10 else "b") for k in range(20)],
        "k long, v string, p string",
    ).coalesce(2)
    wh.create_as(rel, df, TableMeta(partition_by="p"))
    return rel


def _rows(df, cols=("k", "v", "p")):
    return Counter(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_deleted_rows_between_versions(spark, wh):
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel)
    wh.delete_where(rel, "k < 3")
    v2 = wh.snapshot(rel)
    fed = wh.read_deleted_rows(rel, v1, v2)
    assert sorted(r["k"] for r in fed.collect()) == [0, 1, 2]
    # full row content comes back, not just positions
    assert _rows(fed) == Counter({(0, "v0", "a"): 1, (1, "v1", "a"): 1, (2, "v2", "a"): 1})
    # live target sees the same; the v2->live window is empty
    assert sorted(r["k"] for r in wh.read_deleted_rows(rel, v1).collect()) == [0, 1, 2]
    assert wh.read_deleted_rows(rel, v2).count() == 0
    # windows only emit THEIR deletes
    wh.delete_where(rel, "k = 5")
    assert sorted(r["k"] for r in wh.read_deleted_rows(rel, v2).collect()) == [5]


def test_empty_feed_has_table_schema(spark, wh):
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel)
    fed = wh.read_deleted_rows(rel, v1)
    assert fed.count() == 0
    assert fed.columns == ["k", "v", "p"]


def test_changelog_reconstructs_to_state(spark, wh):
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel)
    wh.delete_where(rel, "k in (1, 11)")
    wh.update_where(rel, "k = 2", {"v": F.lit("patched")})
    wh.append(
        rel,
        spark.createDataFrame([(100, "new", "b")], "k long, v string, p string").coalesce(1),
    )
    v2 = wh.snapshot(rel)
    log = wh.read_changelog(rel, v1, v2)
    ins = _rows(log.where("_change_type = 'insert'"))
    dels = _rows(log.where("_change_type = 'delete'"))
    # the update shows as delete(old) + insert(new)
    assert (2, "v2", "a") in dels and (2, "patched", "a") in ins
    # since-state + inserts - deletes == to-state (multiset algebra)
    state = _rows(wh.read_version(rel, v1)) + ins
    state.subtract(dels)
    assert +state == _rows(wh.read_version(rel, v2))


def test_feed_silent_after_maintenance_boundary(spark, wh):
    # apply_deletes folds the vectors in and drops the entries: the
    # window crossing that boundary cannot emit them (documented
    # file-level caveat, same as read_changes on compaction)
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel)
    wh.delete_where(rel, "k < 3")
    wh.apply_deletes(rel)
    v2 = wh.snapshot(rel)
    assert wh.read_deleted_rows(rel, v1, v2).count() == 0


def test_version_order_guard(spark, wh):
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel)
    v2 = wh.snapshot(rel)
    with pytest.raises(ValueError):
        wh.read_deleted_rows(rel, v2, v1)


def test_read_as_of_timestamp_resolution(spark, wh):
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel, "first")
    wh.delete_where(rel, "k < 10")
    v2 = wh.snapshot(rel, "second")
    snaps = {s["version"]: s["created_at"] for s in wh.list_snapshots(rel)}
    assert snaps[v1] <= snaps[v2]
    # at/after each snapshot's own time -> that snapshot's state
    assert wh.version_as_of(rel, snaps[v1]) == v1
    assert wh.read_as_of(rel, snaps[v1]).count() == 20
    assert wh.version_as_of(rel, snaps[v2] + 1) == v2
    assert wh.read_as_of(rel, snaps[v2] + 1).count() == 10
    # before every snapshot -> error
    with pytest.raises(FileNotFoundError):
        wh.version_as_of(rel, snaps[v1] - 10)


def test_expire_snapshots_age_floor(spark, wh):
    rel = _table(spark, wh)
    v1 = wh.snapshot(rel, "a")
    v2 = wh.snapshot(rel, "b")
    v3 = wh.snapshot(rel, "c")
    # everything is younger than an hour: nothing expires despite keep_last=0
    assert wh.expire_snapshots(rel, keep_last=0, min_age_s=3600) == []
    assert [s["version"] for s in wh.list_snapshots(rel)] == [v1, v2, v3]
    # no floor: keep_last applies as before
    assert wh.expire_snapshots(rel, keep_last=1) == [v1, v2]
    assert [s["version"] for s in wh.list_snapshots(rel)] == [v3]
