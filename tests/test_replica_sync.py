"""Row-level replica maintenance (operators/materializations.
run_replica_sync): CDC-apply off the warehouse changelog — full
baseline, then delta windows shipping only the DML, with the
delete-keys-then-insert apply converging under replay."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.materializations import run_replica_sync
from edna_dbt_library_spark.sources import TableMeta, Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _mk_source(spark, wh):
    rel = wh.relation("s", "src")
    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 10 else "b") for k in range(20)],
        "k long, v string, p string",
    ).coalesce(2)
    wh.create_as(rel, df, TableMeta(partition_by="p"))
    return rel


def _content(wh, rel):
    return Counter(
        (r["k"], r["v"], r["p"]) for r in wh.read(rel).select("k", "v", "p").collect()
    )


def test_full_then_delta_mirrors_source(spark, wh):
    src = _mk_source(spark, wh)
    rep = wh.relation("s", "mirror")
    r1 = run_replica_sync(wh, src, rep, keys=["k"])
    assert r1["mode"] == "full" and r1["n_inserted"] == 20
    assert _content(wh, rep) == _content(wh, src)

    # a window of real DML: delete, update, insert
    wh.delete_where(src, "k in (0, 15)")
    wh.update_where(src, "k = 3", {"v": F.lit("patched")})
    wh.append(
        rel=src,
        df=spark.createDataFrame([(100, "new", "b")], "k long, v string, p string").coalesce(1),
    )
    r2 = run_replica_sync(wh, src, rep, keys=["k"])
    assert r2["mode"] == "delta"
    assert _content(wh, rep) == _content(wh, src)
    # the replica was not rebuilt: the sync shipped only the window
    assert r2["n_inserted"] <= 3  # update-insert + appended row

    # empty window is a no-op
    r3 = run_replica_sync(wh, src, rep, keys=["k"])
    assert r3["mode"] == "delta" and r3["n_inserted"] == 0
    assert _content(wh, rep) == _content(wh, src)


def test_replayed_apply_converges(spark, wh):
    # exactly-once EFFECT from at-least-once delivery: re-applying the
    # same window's delete-keys-then-insert leaves the replica unchanged
    src = _mk_source(spark, wh)
    rep = wh.relation("s", "mirror2")
    run_replica_sync(wh, src, rep, keys=["k"])
    wh.update_where(src, "k < 5", {"v": F.lit("u")})
    run_replica_sync(wh, src, rep, keys=["k"])
    want = _content(wh, rep)
    # manual replay of the already-applied window's insert side
    ins = wh.read(src).where("k < 5")
    touched = ins.select("k").dropDuplicates(["k"])
    wh.delete_matching(rep, touched, ["k"])
    wh.append(rep, ins)
    assert _content(wh, rep) == want
    assert _content(wh, rep) == _content(wh, src)


def test_rebaseline_after_replica_drop(spark, wh):
    src = _mk_source(spark, wh)
    rep = wh.relation("s", "mirror3")
    run_replica_sync(wh, src, rep, keys=["k"])
    wh.delete_where(src, "k = 7")
    wh.drop(rep)
    r = run_replica_sync(wh, src, rep, keys=["k"])
    assert r["mode"] == "full"
    assert _content(wh, rep) == _content(wh, src)


def test_watermark_is_selective(spark, wh):
    # replica watermarks never disturb other consumers' snapshots
    src = _mk_source(spark, wh)
    keep = wh.snapshot(src, "user-snapshot")
    rep = wh.relation("s", "mirror4")
    run_replica_sync(wh, src, rep, keys=["k"])
    run_replica_sync(wh, src, rep, keys=["k"])
    notes = [s.get("note") for s in wh.list_snapshots(src)]
    assert "user-snapshot" in notes
    assert notes.count(None) + sum(1 for n in notes if n and n.startswith("replica:")) >= 1
    # exactly one replica watermark survives
    assert sum(1 for n in notes if n and n.startswith("replica:")) == 1


def test_within_window_append_then_delete_never_lands(spark, wh):
    """A row appended AND deleted inside ONE sync window must not reach
    the replica: the raw changelog would emit it as an added-file row
    with no later retraction (read_changes masked=True closes it)."""
    src = _mk_source(spark, wh)
    rep = wh.relation("s", "mirror_wd")
    run_replica_sync(wh, src, rep, keys=["k"])
    wh.append(
        rel=src,
        df=spark.createDataFrame([(100, "x", "a")], "k long, v string, p string"),
    )
    wh.delete_where(src, "k = 100")
    r = run_replica_sync(wh, src, rep, keys=["k"])
    assert r["mode"] == "delta"
    assert _content(wh, rep) == _content(wh, src)
    assert (100, "x", "a") not in _content(wh, rep)


def test_twice_updated_key_lands_final_value_only(spark, wh):
    """Two updates of one key in one window put BOTH rewrites in the
    raw added-file feed; the masked feed keeps only the final copy."""
    src = _mk_source(spark, wh)
    rep = wh.relation("s", "mirror_2u")
    run_replica_sync(wh, src, rep, keys=["k"])
    wh.update_where(src, "k = 3", {"v": F.lit("mid")})
    wh.update_where(src, "k = 3", {"v": F.lit("final")})
    run_replica_sync(wh, src, rep, keys=["k"])
    c = _content(wh, rep)
    assert c == _content(wh, src)
    assert c[(3, "final", "a")] == 1 and (3, "mid", "a") not in c
