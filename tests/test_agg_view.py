"""Incremental aggregate-view maintenance (run_incremental_agg_view):
maintained GROUP-BY view == direct aggregation of the current source
through multi-DML windows, retraction to zero, crash-replay
convergence, the maintenance-fold rebaseline, and the honest-limit
raises (count(*) required, float sums, NULL measures, corrupted
partials)."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators import materializations as mat
from edna_dbt_library_spark.operators.materializations import run_incremental_agg_view
from edna_dbt_library_spark.sources import TableMeta, Warehouse, load_table

AGGS = {"total": ("sum", "amt"), "n_rows": ("count", "*")}


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _direct(wh, src, keys=("grp",)):
    return (
        wh.read(src)
        .groupBy(*keys)
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def _mk_source(spark, wh, rows, name="src"):
    rel = wh.relation("av", name)
    wh.create_as(
        rel,
        spark.createDataFrame(rows, "id long, grp long, amt long").coalesce(2),
        TableMeta(),
    )
    return rel


def test_agg_view_through_dml_windows(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_custkey") % 7).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("amt"),
    )
    src = wh.relation("av", "orders")
    t = wh.relation("av", "view")
    wh.create_as(src, orders.where("id % 2 = 0"), TableMeta())

    out = run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert out["mode"] == "full"
    assert _rows(wh.read(t)) == _rows(_direct(wh, src))

    # window 2: inserts + updates + deletes
    wh.append(src, orders.where("id % 4 = 1"))
    wh.update_where(src, "id % 7 = 0", {"amt": "amt + 5"})
    wh.delete_where(src, "id % 11 = 0")
    out = run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert out["mode"] == "delta" and out["n_groups_upserted"] > 0
    assert _rows(wh.read(t)) == _rows(_direct(wh, src))

    # quiet window: nothing touched
    before = _rows(wh.read(t))
    out = run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert out["mode"] == "delta" and out["n_groups_upserted"] == 0
    assert _rows(wh.read(t)) == before


def test_group_retracts_to_zero_and_in_window_churn(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 3, 10 * i) for i in range(9)])
    t = wh.relation("av", "v")
    run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert wh.read(t).count() == 3

    # drain group 1 to zero rows; add-and-delete a group-2 row within
    # the SAME window (must net to exactly zero, the masked/raw feed
    # asymmetry this operator documents)
    wh.delete_where(src, "grp = 1")
    wh.append(
        src,
        spark.createDataFrame([(100, 2, 999)], "id long, grp long, amt long"),
    )
    wh.delete_where(src, "id = 100")
    out = run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert out["mode"] == "delta" and out["n_groups_retracted"] >= 1
    assert _rows(wh.read(t)) == _rows(_direct(wh, src))
    assert wh.read(t).where("grp = 1").count() == 0


def test_crash_replay_converges(spark, tmp_path, monkeypatch):
    """Crash AFTER the apply but BEFORE the watermark promotion: the
    rerun replays the window; the touched-group masks re-retire the
    partial landings, so partials never double-count."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 2, i) for i in range(6)])
    t = wh.relation("av", "v")
    run_incremental_agg_view(wh, src, t, ["grp"], AGGS)

    wh.append(
        src, spark.createDataFrame([(10, 0, 99)], "id long, grp long, amt long")
    )
    real = mat.Warehouse.set_snapshot_note

    def boom(self, rel, version, note):
        raise RuntimeError("crash before watermark promote")

    monkeypatch.setattr(mat.Warehouse, "set_snapshot_note", boom)
    with pytest.raises(RuntimeError):
        run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    monkeypatch.setattr(mat.Warehouse, "set_snapshot_note", real)

    run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert _rows(wh.read(t)) == _rows(_direct(wh, src))


def test_source_fold_triggers_rebaseline(spark, tmp_path):
    """compact()/apply_deletes() during the window remove data files;
    the changelog algebra would double-count their re-emitted rows, so
    the sync must detect it from the manifests and fully re-aggregate
    (mode 'rebaseline'), never silently drift."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 3, i) for i in range(12)])
    t = wh.relation("av", "v")
    run_incremental_agg_view(wh, src, t, ["grp"], AGGS)

    wh.delete_where(src, "id % 4 = 0")
    wh.apply_deletes(src)  # fold: rewrites touched files
    out = run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert out["mode"] == "rebaseline"
    assert _rows(wh.read(t)) == _rows(_direct(wh, src))

    # and the next quiet window is a plain delta again
    out = run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    assert out["mode"] == "delta"


def test_agg_view_guards(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(1, 1, 2)])
    t = wh.relation("av", "v")
    with pytest.raises(ValueError, match="count"):
        run_incremental_agg_view(wh, src, t, ["grp"], {"s": ("sum", "amt")})
    with pytest.raises(ValueError, match="sum/count"):
        run_incremental_agg_view(
            wh, src, t, ["grp"], {"m": ("min", "amt"), "n": ("count", "*")}
        )
    fsrc = wh.relation("av", "fsrc")
    wh.create_as(
        fsrc,
        spark.createDataFrame([(1, 1, 2.5)], "id long, grp long, amt double"),
        TableMeta(),
    )
    with pytest.raises(ValueError, match="floating-point"):
        run_incremental_agg_view(wh, fsrc, t, ["grp"], AGGS)
    nsrc = wh.relation("av", "nsrc")
    wh.create_as(
        nsrc,
        spark.createDataFrame(
            [(1, 1, None)], "id long, grp long, amt long"
        ),
        TableMeta(),
    )
    with pytest.raises(ValueError, match="NULL in sum"):
        run_incremental_agg_view(wh, nsrc, t, ["grp"], AGGS)

    # out-of-band edit of the view's partials -> the next window's net
    # count can go negative; the sync must raise, not land garbage
    run_incremental_agg_view(wh, src, t, ["grp"], AGGS)
    wh.delete_where(t, "grp = 1")  # corrupt: partials gone, source not
    wh.delete_where(src, "id = 1")
    with pytest.raises(ValueError, match="negative"):
        run_incremental_agg_view(wh, src, t, ["grp"], AGGS)


# --- property fuzz: random DML windows --------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("ins"), st.integers(0, 3)),
        st.tuples(st.just("del"), st.integers(0, 4)),
        st.tuples(st.just("upd"), st.integers(0, 4)),
    ),
    min_size=1,
    max_size=4,
)
_WINDOWS = st.lists(_OPS, min_size=1, max_size=3)


@settings(max_examples=4, deadline=None)
@given(_WINDOWS)
def test_agg_view_fuzz_matches_direct_aggregation(
    spark, tmp_path_factory, windows
):
    """Any interleaving of inserts/updates/deletes, chopped into any
    window boundaries, must leave the maintained view equal to the
    direct aggregation after every sync — the retraction algebra has no
    op-order or window-shape dependence. The maintained view carries a
    DERIVED key (band = id div 7), a sigma the fuzz's amt updates
    cross in both directions (amt % 3 != 1), and since r13 an
    EXPRESSION measure (sum(amt * (3 + id % 2))) — derived-key,
    symmetric-feed-filter, and measure-expression paths are fuzzed at
    the same cost."""
    fuzz_aggs = dict(AGGS)
    fuzz_aggs["rev"] = ("sum", None, {"expr": "amt * (3 + id % 2)"})
    kw = dict(derived_keys={"band": "id div 7"}, where="amt % 3 != 1")
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("avfuzz")))
    src = _mk_source(spark, wh, [(i, i % 4, i) for i in range(20)])
    t = wh.relation("av", "v")
    run_incremental_agg_view(wh, src, t, ["grp"], fuzz_aggs, **kw)

    def direct():
        return (
            wh.read(src)
            .withColumn("band", F.expr("id div 7"))
            .where("amt % 3 != 1")
            .groupBy("grp", "band")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.expr("amt * (3 + id % 2)")).alias("rev"),
            )
        )

    next_id = 1000
    for ops in windows:
        for op, arg in ops:
            if op == "ins":
                wh.append(
                    src,
                    spark.createDataFrame(
                        [(next_id, arg, next_id)], "id long, grp long, amt long"
                    ),
                )
                next_id += 1
            elif op == "del":
                wh.delete_where(src, f"id % 5 = {arg}")
            elif op == "upd":
                wh.update_where(src, f"id % 5 = {arg}", {"amt": F.col("amt") + 1})
        run_incremental_agg_view(wh, src, t, ["grp"], fuzz_aggs, **kw)
        assert _rows(wh.read(t)) == _rows(direct())


def test_stream_agg_view_drain_equals_direct(spark, tmp_path):
    """A full drain of the streaming wrapper leaves the view equal to
    the direct aggregation; a re-drain with nothing new is a no-op."""
    from edna_dbt_library_spark.streaming import stream_agg_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 3, i * 10) for i in range(12)])
    t = wh.relation("av", "v")
    cp = str(tmp_path / "cp")
    stream_agg_view(wh, src, t, ["grp"], AGGS, cp).awaitTermination(120)
    assert _rows(wh.read(t)) == _rows(_direct(wh, src))

    wh.update_where(src, "id = 1", {"amt": F.lit(555)})
    wh.delete_where(src, "grp = 2")
    wh.append(
        src, spark.createDataFrame([(50, 0, 7)], "id long, grp long, amt long")
    )
    stream_agg_view(wh, src, t, ["grp"], AGGS, cp).awaitTermination(120)
    got = _rows(wh.read(t))
    assert got == _rows(_direct(wh, src))
    assert wh.read(t).where("grp = 2").count() == 0

    stream_agg_view(wh, src, t, ["grp"], AGGS, cp).awaitTermination(120)
    assert _rows(wh.read(t)) == got


def _ts_rows(spark, pairs):
    """(id, grp, epoch_seconds, amt) rows with a real timestamp col."""
    df = spark.createDataFrame(
        pairs, "id long, grp long, sec long, amt long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    return df


def test_timeseries_view_through_dml_windows(spark, tmp_path):
    """Changelog-driven continuous aggregate (the r10 verdict's
    What's-missing #5): a time-bucketed SUM/COUNT view maintained
    under full DML — a ts-moving UPDATE retracts from the old bucket
    and lands in the new one, a bucket drained of events disappears,
    and the maintained state equals the direct time_bucket aggregation
    after every window."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_timeseries_view,
    )
    from edna_dbt_library_spark.operators.timeseries import HOUR_US, time_bucket

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "ev")
    # 3 keys x events across 4 hour-buckets
    rows = [
        (i, i % 3, 3600 * (i % 4) + 60 * i, 10 * i + 1) for i in range(24)
    ]
    wh.create_as(src, _ts_rows(spark, rows).coalesce(2), TableMeta())
    tgt = wh.relation("av", "ev_hourly")

    def direct():
        return (
            time_bucket(wh.read(src), "ts", HOUR_US)
            .groupBy("grp", "bucket")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
        )

    s = run_incremental_timeseries_view(
        wh, src, tgt, ["grp"], "ts", AGGS, bucket_us=HOUR_US
    )
    assert s["mode"] == "full"
    assert _rows(wh.read(tgt)) == _rows(direct())

    # window: measure update, a TS-moving update (bucket boundary
    # cross), a whole-bucket drain, and fresh appends
    wh.update_where(src, "id % 5 = 0", {"amt": "amt + 7"})
    wh.update_where(src, "id = 1", {"ts": "ts + INTERVAL 2 HOURS"})
    wh.delete_where(src, "unix_micros(ts) div 3600000000 = 3")
    wh.append(src, _ts_rows(spark, [(100, 1, 3600 * 9, 5), (101, 2, 3600 * 9 + 30, 6)]))
    s = run_incremental_timeseries_view(
        wh, src, tgt, ["grp"], "ts", AGGS, bucket_us=HOUR_US
    )
    assert s["mode"] == "delta"
    assert s["n_groups_retracted"] > 0  # the drained bucket's groups
    assert _rows(wh.read(tgt)) == _rows(direct())
    assert wh.read(tgt).where("bucket = 3").count() == 0

    # quiet window
    s = run_incremental_timeseries_view(
        wh, src, tgt, ["grp"], "ts", AGGS, bucket_us=HOUR_US
    )
    assert s["n_groups_upserted"] == 0 and s["n_groups_retracted"] == 0
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_derived_key_collision_raises(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(1, 1, 1)])
    tgt = wh.relation("av", "v")
    for bad in ("grp", "amt", "total"):
        with pytest.raises(ValueError, match="collide"):
            run_incremental_agg_view(
                wh, src, tgt, ["grp"], AGGS,
                derived_keys={bad: "id div 2"},
            )
    assert not wh.exists(tgt)


def test_derived_key_where_sees_derived_column(spark, tmp_path):
    """where may reference a derived key (projected first): the view
    aggregates only the sigma-admitted buckets, symmetrically on both
    feeds."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(
        spark, wh, [(i, i % 2, i) for i in range(20)], name="dsrc"
    )
    tgt = wh.relation("av", "dv")
    kw = dict(derived_keys={"band": "id div 5"}, where="band != 1")
    run_incremental_agg_view(wh, src, tgt, ["grp"], AGGS, **kw)

    def direct():
        return (
            wh.read(src)
            .withColumn("band", F.expr("id div 5"))
            .where("band != 1")
            .groupBy("grp", "band")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
        )

    assert _rows(wh.read(tgt)) == _rows(direct())
    # moves across the sigma boundary via the DERIVED key
    wh.update_where(src, "id = 7", {"id": "2"})   # band 1 -> 0: enters
    wh.delete_where(src, "id >= 15")              # band 3 drains
    s = run_incremental_agg_view(wh, src, tgt, ["grp"], AGGS, **kw)
    assert s["mode"] == "delta"
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_null_group_key_raises(spark, tmp_path):
    """NULL group keys raise (full build AND window feed): the keyed
    upsert's equi-join mask can never retire a NULL-key group, so it
    would silently fork — the same honest-limit class as float sums."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "nsrc")
    tgt = wh.relation("av", "nv")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(1, None, 5), (2, 1, 6)], "id long, grp long, amt long"
        ),
        TableMeta(),
    )
    with pytest.raises(ValueError, match="NULL group key"):
        run_incremental_agg_view(wh, src, tgt, ["grp"], AGGS)
    # clean build, then a NULL sneaks into the window: the sync raises
    wh.delete_where(src, "grp IS NULL")
    run_incremental_agg_view(wh, src, tgt, ["grp"], AGGS)
    wh.append(
        src,
        spark.createDataFrame([(3, None, 7)], "id long, grp long, amt long"),
    )
    with pytest.raises(ValueError, match="NULL group key"):
        run_incremental_agg_view(wh, src, tgt, ["grp"], AGGS)


def test_distinct_view_through_dml_windows(spark, tmp_path):
    """Exact COUNT(DISTINCT) via the two-level composition: the
    distinct count moves only when a (group, value) appears or fully
    retracts — deleting ONE of a value's rows must NOT decrement it,
    deleting the LAST must; NULL values are ignored (SQL semantics)."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_distinct_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "dsrc2")
    tgt = wh.relation("av", "ddst")
    rows = [(i, i % 3, (i % 7) if i % 11 else None) for i in range(40)]
    wh.create_as(
        src,
        spark.createDataFrame(rows, "id long, grp long, v long").coalesce(2),
        TableMeta(),
    )

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(F.count_distinct("v").alias("n_distinct"))
        )

    s = run_incremental_distinct_view(wh, src, tgt, ["grp"], "v")
    assert s["mode"] == "full" and s["elems"]["mode"] == "full"
    assert _rows(wh.read(tgt)) == _rows(direct())

    # window: kill ONE row of a multi-row value (count must hold),
    # kill ALL rows of another value (count must drop), introduce a
    # brand-new value, flip a row to NULL (drops from its value's
    # multiplicity), append duplicates of an existing value (no-op)
    wh.delete_where(src, "id = 1")            # (grp 1, v 1) loses one of several
    wh.delete_where(src, "v = 6")             # value 6 fully retracts everywhere
    wh.update_where(src, "id = 2", {"v": "99"})   # new value for grp 2
    wh.update_where(src, "id = 3", {"v": "NULL"})  # -> ignored by distinct
    wh.append(
        src,
        spark.createDataFrame([(100, 0, 0), (101, 0, 0)], "id long, grp long, v long"),
    )
    s = run_incremental_distinct_view(wh, src, tgt, ["grp"], "v")
    assert s["mode"] == "delta" and s["elems"]["mode"] == "delta"
    assert _rows(wh.read(tgt)) == _rows(direct())

    # quiet window: both levels net zero
    s = run_incremental_distinct_view(wh, src, tgt, ["grp"], "v")
    assert s["n_groups_upserted"] == 0 and s["elems"]["n_groups_upserted"] == 0
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_distinct_view_time_bucketed_and_crash_between_levels(
    spark, tmp_path, monkeypatch
):
    """derived_keys compose (bucketed distinct counts), and a crash
    BETWEEN the two levels converges on the next sync (level 2's
    child window covers both)."""
    from edna_dbt_library_spark.operators import materializations as m
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_distinct_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "tsrc")
    tgt = wh.relation("av", "tdst")
    rows = [(i, i % 2, 3600 * (i % 3) + i, i % 5) for i in range(30)]
    wh.create_as(
        src,
        spark.createDataFrame(rows, "id long, grp long, sec long, v long")
        .withColumn("ts", F.timestamp_seconds("sec"))
        .drop("sec")
        .coalesce(2),
        TableMeta(),
    )
    dk = {"bucket": "unix_micros(ts) div 3600000000"}

    def direct():
        return (
            wh.read(src)
            .withColumn("bucket", F.expr(dk["bucket"]))
            .groupBy("grp", "bucket")
            .agg(F.count_distinct("v").alias("n_distinct"))
        )

    run_incremental_distinct_view(
        wh, src, tgt, ["grp"], "v", derived_keys=dk
    )
    assert _rows(wh.read(tgt)) == _rows(direct())

    # crash between levels: level 1 lands, level 2 never runs
    wh.delete_where(src, "v = 2")
    real = m.run_incremental_agg_view
    calls = {"n": 0}

    def crashing(*a, **k):
        out = real(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("crash between levels")
        return out

    monkeypatch.setattr(m, "run_incremental_agg_view", crashing)
    with pytest.raises(RuntimeError, match="between levels"):
        run_incremental_distinct_view(
            wh, src, tgt, ["grp"], "v", derived_keys=dk
        )
    monkeypatch.setattr(m, "run_incremental_agg_view", real)
    # next sync: level 1 sees a quiet window, level 2 catches up
    s = run_incremental_distinct_view(
        wh, src, tgt, ["grp"], "v", derived_keys=dk
    )
    assert s["elems"]["n_groups_upserted"] == 0  # l1 already landed
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_stream_distinct_view_drain_equals_direct(spark, tmp_path):
    """A full drain of the streaming distinct-view wrapper leaves the
    view equal to the direct count(DISTINCT); a re-drain with nothing
    new is a no-op."""
    from edna_dbt_library_spark.streaming import stream_distinct_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "sdsrc")
    tgt = wh.relation("av", "sddst")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i % 6) for i in range(24)], "id long, grp long, v long"
        ).coalesce(2),
        TableMeta(),
    )
    q = stream_distinct_view(wh, src, tgt, ["grp"], "v", str(tmp_path / "cp"))
    q.awaitTermination()

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(F.count_distinct("v").alias("n_distinct"))
        )

    assert _rows(wh.read(tgt)) == _rows(direct())
    # DML between drains: deletes retract, new values land
    wh.delete_where(src, "v = 5")
    wh.append(
        src, spark.createDataFrame([(100, 0, 77)], "id long, grp long, v long")
    )
    q = stream_distinct_view(wh, src, tgt, ["grp"], "v", str(tmp_path / "cp"))
    q.awaitTermination()
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_extrema_view_through_dml_windows(spark, tmp_path):
    """min/max views via touched-group recompute: deleting the current
    extremum must surface the runner-up (the case no retraction algebra
    can serve), untouched groups are never rescanned wrong, drained
    groups retract, and the maintained state equals the direct min/max
    after every window."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_extrema_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 3, 10 * i) for i in range(15)], "xsrc")
    tgt = wh.relation("av", "xv")
    XAGGS = {"lo": ("min", "amt"), "hi": ("max", "amt")}

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(F.min("amt").alias("lo"), F.max("amt").alias("hi"))
        )

    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s["mode"] == "full"
    assert _rows(wh.read(tgt)) == _rows(direct())

    # delete group 0's CURRENT max (id=12, amt=120): the runner-up must
    # surface; bump group 1's max via update; drain group 2 entirely
    wh.delete_where(src, "id = 12")
    wh.update_where(src, "id = 13", {"amt": "amt + 1000"})
    wh.delete_where(src, "grp = 2")
    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s["mode"] == "delta"
    assert s["n_groups_retracted"] == 1  # grp 2
    assert _rows(wh.read(tgt)) == _rows(direct())
    assert wh.read(tgt).where("grp = 0 AND hi = 90").count() == 1
    assert wh.read(tgt).where("grp = 2").count() == 0

    # quiet window
    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s["n_groups_upserted"] == 0 and s["n_groups_retracted"] == 0
    assert _rows(wh.read(tgt)) == _rows(direct())

    # in-window fold swallows changelog evidence -> rebaseline
    wh.delete_where(src, "id % 4 = 0")
    wh.apply_deletes(src)
    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s["mode"] == "rebaseline"
    assert _rows(wh.read(tgt)) == _rows(direct())

    # guards: sum/count belong in the agg view
    with pytest.raises(ValueError, match="min/max only"):
        run_incremental_extrema_view(
            wh, src, tgt, ["grp"], {"t": ("sum", "amt")}
        )


def test_extrema_append_only_fast_path(spark, tmp_path):
    """A window with NO deletes takes the merge fast path (stats carry
    fast_path='append'): greatest/least(stored, window partials) with
    no touched-group source rescan — new groups land, existing extrema
    widen or hold, NULL semantics match SQL min/max; a later window
    WITH a delete takes the recompute path and still matches."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_extrema_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "fpsrc")
    tgt = wh.relation("av", "fpx")
    rows = [(i, i % 3, (17 * i) % 50 if i % 5 else None) for i in range(20)]
    wh.create_as(
        src,
        spark.createDataFrame(rows, "id long, grp long, v long").coalesce(2),
        TableMeta(),
    )
    XAGGS = {"lo": ("min", "v"), "hi": ("max", "v")}

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        )

    run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)

    # append-only window: new group (grp 7), widened extrema, NULL rows
    wh.append(
        src,
        spark.createDataFrame(
            [(100, 7, 5), (101, 0, 999), (102, 1, None), (103, 0, -4)],
            "id long, grp long, v long",
        ),
    )
    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s["mode"] == "delta" and s.get("fast_path") == "append"
    assert s["n_groups_retracted"] == 0
    assert _rows(wh.read(tgt)) == _rows(direct())

    # append-only again, values INSIDE current extrema: stored rows hold
    wh.append(
        src,
        spark.createDataFrame([(110, 0, 10)], "id long, grp long, v long"),
    )
    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s.get("fast_path") == "append"
    assert _rows(wh.read(tgt)) == _rows(direct())

    # a delete in the window: the slow recompute path (no fast_path key)
    wh.delete_where(src, "id = 101")  # grp 0's max dies, runner-up surfaces
    wh.append(
        src, spark.createDataFrame([(120, 2, 77)], "id long, grp long, v long")
    )
    s = run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS)
    assert s["mode"] == "delta" and "fast_path" not in s
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_extrema_view_sigma_and_derived_keys(spark, tmp_path, monkeypatch):
    """Boundary-crossing updates touch the group from whichever feed
    admits them; derived keys bucket the extrema; crash-before-promote
    replays converge (the apply is a keyed replace)."""
    from edna_dbt_library_spark.operators import materializations as m
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_extrema_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 2, i) for i in range(20)], "ysrc")
    tgt = wh.relation("av", "yv")
    kw = dict(
        derived_keys={"band": "id div 5"},
        where="amt % 4 != 1",
    )
    XAGGS = {"hi": ("max", "amt")}

    def direct():
        return (
            wh.read(src)
            .withColumn("band", F.expr("id div 5"))
            .where("amt % 4 != 1")
            .groupBy("grp", "band")
            .agg(F.max("amt").alias("hi"))
        )

    run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS, **kw)
    assert _rows(wh.read(tgt)) == _rows(direct())

    # the group max moves OUT of sigma (amt 19 -> 21, 21%4=1): the
    # runner-up inside sigma must surface
    wh.update_where(src, "id = 19", {"amt": "21"})
    wh.delete_where(src, "id >= 15 AND id < 18")
    run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS, **kw)
    assert _rows(wh.read(tgt)) == _rows(direct())

    # crash before the watermark promotes: replay re-replaces
    wh.append(
        src, spark.createDataFrame([(100, 0, 400)], "id long, grp long, amt long")
    )
    real = m.Warehouse.set_snapshot_note

    def boom(self, rel, version, note):
        raise RuntimeError("crash before promote")

    monkeypatch.setattr(m.Warehouse, "set_snapshot_note", boom)
    with pytest.raises(RuntimeError):
        run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS, **kw)
    monkeypatch.setattr(m.Warehouse, "set_snapshot_note", real)
    run_incremental_extrema_view(wh, src, tgt, ["grp"], XAGGS, **kw)
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_avg_derived_output_through_dml_windows(spark, tmp_path):
    """("avg", col): the view maintains the hidden exact sum and serves
    the stored sum/count division — through DML windows the avg column
    must equal the direct exact-sum-over-count quotient BIT-identically
    (exact long sum cast to double, divided by the exact count), and
    untouched groups' stored quotients must stay correct."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _mk_source(spark, wh, [(i, i % 4, 7 * i + 1) for i in range(40)], "asrc")
    t = wh.relation("av", "avgv")
    aggs = {"n_rows": ("count", "*"), "mean_amt": ("avg", "amt")}

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (
                    F.sum("amt").cast("double")
                    / F.count(F.lit(1)).cast("long")
                ).alias("mean_amt"),
            )
        )

    s = run_incremental_agg_view(wh, src, t, ["grp"], aggs)
    assert s["mode"] == "full"
    got = wh.read(t)
    # declared outputs at their positions, hidden exact sum last
    assert got.columns == ["grp", "n_rows", "mean_amt", "_mean_amt__sum"]
    assert _rows(got.select("grp", "n_rows", "mean_amt")) == _rows(direct())

    wh.append(
        src,
        spark.createDataFrame(
            [(100, 0, 999), (101, 9, 5)], "id long, grp long, amt long"
        ),
    )
    wh.update_where(src, "id % 5 = 0", {"amt": "amt + 13"})
    wh.delete_where(src, "id % 7 = 3")
    s = run_incremental_agg_view(wh, src, t, ["grp"], aggs)
    assert s["mode"] == "delta" and s["n_groups_upserted"] > 0
    assert _rows(wh.read(t).select("grp", "n_rows", "mean_amt")) == _rows(direct())

    # quiet window: stored quotients stay put
    before = _rows(wh.read(t))
    run_incremental_agg_view(wh, src, t, ["grp"], aggs)
    assert _rows(wh.read(t)) == before


def test_quantize_sugar_maintains_float_measures_exactly(spark, tmp_path):
    """("sum", col, {"quantize": d}) admits a DOUBLE measure by
    maintaining cast(round(col * 10^d) as bigint) — the stored sum is
    exact integer units, retraction subtracts exactly what insertion
    added (same row-local derivation on both feeds), and a bare float
    sum still raises with a pointer to the sugar. A quantized AVG is
    served in ORIGINAL units (sum / 10^d / count, fixed IEEE order —
    ADVICE r12 #1)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("av", "qsrc")
    rows = [(i, i % 3, i * 0.1 + 0.01) for i in range(30)]
    wh.create_as(
        rel,
        spark.createDataFrame(rows, "id long, grp long, amt double").coalesce(2),
        TableMeta(),
    )
    t = wh.relation("av", "qv")
    with pytest.raises(ValueError, match="quantize"):
        run_incremental_agg_view(
            wh, rel, t, ["grp"], {"s": ("sum", "amt"), "n": ("count", "*")}
        )
    aggs = {
        "s": ("sum", "amt", {"quantize": 9}),
        "n": ("count", "*"),
        "m": ("avg", "amt", {"quantize": 9}),
    }

    def direct():
        q = F.round(F.col("amt") * F.lit(1e9)).cast("long")
        return (
            wh.read(rel)
            .groupBy("grp")
            .agg(
                F.sum(q).alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
                (
                    F.sum(q).cast("double") / F.lit(1e9) / F.count(F.lit(1))
                ).alias("m"),
            )
        )

    s = run_incremental_agg_view(wh, rel, t, ["grp"], aggs)
    assert s["mode"] == "full"
    assert _rows(wh.read(t).select("grp", "s", "n", "m")) == _rows(direct())

    wh.update_where(rel, "id % 4 = 1", {"amt": "amt * 2.0"})
    wh.delete_where(rel, "id % 5 = 0")
    wh.append(
        rel,
        spark.createDataFrame([(200, 1, 3.30001)], "id long, grp long, amt double"),
    )
    s = run_incremental_agg_view(wh, rel, t, ["grp"], aggs)
    assert s["mode"] == "delta"
    assert _rows(wh.read(t).select("grp", "s", "n", "m")) == _rows(direct())

    # malformed 3-part specs raise before anything lands
    with pytest.raises(ValueError, match="3-part spec"):
        run_incremental_agg_view(
            wh, rel, wh.relation("av", "qv2"), ["grp"],
            {"s": ("count", "*", {"quantize": 2}), "n": ("count", "*")},
        )
    # non-dict opts are the SAME parse error, not a TypeError (ADVICE r12)
    with pytest.raises(ValueError, match="3-part spec"):
        run_incremental_agg_view(
            wh, rel, wh.relation("av", "qv2"), ["grp"],
            {"s": ("sum", "amt", 2), "n": ("count", "*")},
        )


def test_expression_measures_maintain_exactly(spark, tmp_path):
    """("sum"|"avg", None, {"expr": sql[, "quantize": d]}) aggregates a
    row-local expression: the derivation runs identically on the full
    build and both window feeds, so retraction is exact through
    updates/deletes; a DOUBLE-typed expression still raises without
    quantize (the exactness contract is on the EXPRESSION's type)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("av", "esrc")
    rows = [(i, i % 3, i % 50, (i * 7) % 100) for i in range(40)]
    wh.create_as(
        rel,
        spark.createDataFrame(
            rows, "id long, grp long, price long, disc long"
        ).coalesce(2),
        TableMeta(),
    )
    t = wh.relation("av", "ev")
    # double-typed expression without quantize: the float-sum raise
    # (note 1.0-style literals parse as DECIMAL in Spark and are
    # legally retractable — the raise needs a genuine double)
    with pytest.raises(ValueError, match="floating-point"):
        run_incremental_agg_view(
            wh, rel, t, ["grp"],
            {
                "rev": (
                    "sum",
                    None,
                    {"expr": "cast(price as double) * (1.0 - disc / 100.0)"},
                ),
                "n": ("count", "*"),
            },
        )
    aggs = {
        "rev": ("sum", None, {"expr": "price * (100 - disc)"}),
        "n": ("count", "*"),
        "m": (
            "avg",
            None,
            {"expr": "price * (1.0 - disc / 100.0)", "quantize": 6},
        ),
    }

    def direct():
        e = F.expr("price * (100 - disc)")
        q = F.round(
            F.expr("price * (1.0 - disc / 100.0)") * F.lit(1e6)
        ).cast("long")
        return (
            wh.read(rel)
            .groupBy("grp")
            .agg(
                F.sum(e).alias("rev"),
                F.count(F.lit(1)).cast("long").alias("n"),
                (
                    F.sum(q).cast("double") / F.lit(1e6) / F.count(F.lit(1))
                ).alias("m"),
            )
        )

    s = run_incremental_agg_view(wh, rel, t, ["grp"], aggs)
    assert s["mode"] == "full"
    assert _rows(wh.read(t).select("grp", "rev", "n", "m")) == _rows(direct())

    wh.update_where(rel, "id % 4 = 1", {"disc": "disc + 5"})
    wh.delete_where(rel, "id % 5 = 0")
    wh.append(
        rel,
        spark.createDataFrame(
            [(200, 1, 30, 15)], "id long, grp long, price long, disc long"
        ),
    )
    s = run_incremental_agg_view(wh, rel, t, ["grp"], aggs)
    assert s["mode"] == "delta"
    assert _rows(wh.read(t).select("grp", "rev", "n", "m")) == _rows(direct())


def test_stream_extrema_view_drain_equals_direct(spark, tmp_path):
    """A full drain of the streaming extrema-view wrapper leaves the
    view equal to the direct min/max; DML between drains retracts dead
    extrema and lands new ones."""
    from edna_dbt_library_spark.streaming import stream_extrema_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "sxsrc")
    tgt = wh.relation("av", "sxdst")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, (11 * i) % 40) for i in range(24)],
            "id long, grp long, v long",
        ).coalesce(2),
        TableMeta(),
    )
    aggs = {"lo": ("min", "v"), "hi": ("max", "v")}
    q = stream_extrema_view(wh, src, tgt, ["grp"], aggs, str(tmp_path / "cp"))
    q.awaitTermination()

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        )

    assert _rows(wh.read(tgt)) == _rows(direct())
    wh.delete_where(src, "v >= 35")  # kills current maxima
    wh.append(
        src, spark.createDataFrame([(100, 1, -5)], "id long, grp long, v long")
    )
    q = stream_extrema_view(wh, src, tgt, ["grp"], aggs, str(tmp_path / "cp"))
    q.awaitTermination()
    assert _rows(wh.read(tgt)) == _rows(direct())


def test_agg_distinct_view_through_dml_windows(spark, tmp_path):
    """The mixed rollup (run_incremental_agg_distinct_view): counts/sums
    next to an exact count(DISTINCT) in ONE maintained target — through
    DML windows the serve join must equal the direct mixed aggregation,
    a group with all-NULL values must show 0 distinct, and a quiet
    window must SKIP the serve rewrite (pure metadata no-op)."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_distinct_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "adsrc")
    tgt = wh.relation("av", "addst")
    rows = [(i, i % 4, 10 * i, (i % 6) if i % 9 else None) for i in range(40)]
    # grp 3 gets only NULL values for v
    rows += [(100 + i, 5, 7, None) for i in range(3)]
    wh.create_as(
        src,
        spark.createDataFrame(
            rows, "id long, grp long, amt long, v long"
        ).coalesce(2),
        TableMeta(),
    )
    aggs = {"total": ("sum", "amt"), "n": ("count", "*")}

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.count_distinct("v").alias("nd"),
            )
        )

    s = run_incremental_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "v", out="nd"
    )
    assert s["served"] == "full" and s["agg"]["mode"] == "full"
    got = wh.read(tgt)
    assert got.columns == ["grp", "total", "n", "nd"]
    assert _rows(got) == _rows(direct())
    assert wh.read(tgt).where("grp = 5").first()["nd"] == 0  # all-NULL group

    # window: value churn + measure churn + group drain
    wh.delete_where(src, "id % 7 = 2")
    wh.update_where(src, "id % 5 = 0", {"v": "99"})
    wh.update_where(src, "id % 11 = 3", {"amt": "amt + 4"})
    wh.delete_where(src, "grp = 2")
    s = run_incremental_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "v", out="nd"
    )
    # incremental serve: touched-group keyed upsert, not a rewrite
    assert s["served"] == "delta" and s["n_groups_upserted"] > 0
    assert _rows(wh.read(tgt)) == _rows(direct())
    assert wh.read(tgt).where("grp = 2").count() == 0

    # quiet window: children net zero, serve rewrite SKIPPED
    s = run_incremental_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "v", out="nd"
    )
    assert not s["served"] and s["n_groups_upserted"] == 0
    assert _rows(wh.read(tgt)) == _rows(direct())

    # out/key collision raises UP FRONT, before any child syncs
    # (ADVICE r12 #3 — a DataFrame caller would otherwise hit an
    # ambiguous-column AnalysisException at serve time)
    with pytest.raises(ValueError, match="collides"):
        run_incremental_agg_distinct_view(
            wh, src, wh.relation("av", "adbad"), ["grp"], aggs, "v",
            out="total",
        )
    assert not wh.exists(wh.relation("av", "adbad__agg"))


def test_agg_distinct_delta_serve_replay_and_rebaseline(spark, tmp_path):
    """The incremental serve's delivery contract: a crash AFTER the
    children sync but BEFORE the serve apply (simulated by sweeping the
    pending serve watermark) replays the window convergently — the
    keyed REPLACE lands the same final state; and a child rebaseline
    (snapshots destroyed) falls back to the full group-domain
    rewrite."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_distinct_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "rsrc")
    tgt = wh.relation("av", "rdst")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i, i % 5) for i in range(30)],
            "id long, grp long, amt long, u long",
        ).coalesce(2),
        TableMeta(),
    )
    aggs = {"n": ("count", "*"), "total": ("sum", "amt")}

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("amt").alias("total"),
                F.count_distinct("u").alias("nu"),
            )
        )

    run_incremental_agg_distinct_view(wh, src, tgt, ["grp"], aggs, "u", out="nu")
    wh.update_where(src, "id % 4 = 0", {"u": "9"})
    wh.delete_where(src, "id % 7 = 1")
    s = run_incremental_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "u", out="nu"
    )
    assert s["served"] == "delta"
    assert _rows(wh.read(tgt).select("grp", "n", "total", "nu")) == _rows(direct())

    # crash-replay: inject a crash AT THE PROMOTE (serve already
    # applied, watermark still '!pending', prior promoted note intact)
    # — the next sync must replay the window and the keyed REPLACE
    # must converge to the same state
    wh.update_where(src, "id % 6 = 2", {"amt": "amt + 1"})
    orig_set_note = wh.set_snapshot_note

    def crashing_set_note(rel, v, note):
        if note.startswith("aggdview:"):
            raise RuntimeError("injected crash at serve promote")
        return orig_set_note(rel, v, note)

    wh.set_snapshot_note = crashing_set_note
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            run_incremental_agg_distinct_view(
                wh, src, tgt, ["grp"], aggs, "u", out="nu"
            )
    finally:
        wh.set_snapshot_note = orig_set_note
    # the crashed apply already landed — the table is correct but the
    # watermark did not move; the replay must re-serve convergently
    s = run_incremental_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "u", out="nu"
    )
    assert s["served"] == "delta"
    assert _rows(wh.read(tgt).select("grp", "n", "total", "nu")) == _rows(direct())

    # child rebaseline: a fold on the source forces the agg child to
    # drop/create, destroying its serve watermark — the next serve
    # must fall back to the full rewrite and still match
    wh.delete_where(src, "id % 11 = 3")
    wh.apply_deletes(src)
    s = run_incremental_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "u", out="nu"
    )
    assert s["agg"]["mode"] == "rebaseline" and s["served"] == "full"
    assert _rows(wh.read(tgt).select("grp", "n", "total", "nu")) == _rows(direct())


def test_stream_agg_distinct_view_drain_equals_direct(spark, tmp_path):
    """A full drain of the streaming mixed-rollup wrapper leaves the
    target equal to the direct counts+sum+count(DISTINCT); DML between
    drains syncs both children and re-serves."""
    from edna_dbt_library_spark.streaming import stream_agg_distinct_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("av", "sadsrc")
    tgt = wh.relation("av", "saddst")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i, i % 5) for i in range(24)],
            "id long, grp long, amt long, u long",
        ).coalesce(2),
        TableMeta(),
    )
    aggs = {"n": ("count", "*"), "total": ("sum", "amt")}

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("amt").alias("total"),
                F.count_distinct("u").alias("nu"),
            )
        )

    q = stream_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "u", str(tmp_path / "cp"), out="nu"
    )
    q.awaitTermination()
    assert _rows(wh.read(tgt).select("grp", "n", "total", "nu")) == _rows(direct())
    wh.delete_where(src, "u = 2")
    wh.append(
        src,
        spark.createDataFrame([(100, 1, 9, 77)], "id long, grp long, amt long, u long"),
    )
    q = stream_agg_distinct_view(
        wh, src, tgt, ["grp"], aggs, "u", str(tmp_path / "cp"), out="nu"
    )
    q.awaitTermination()
    assert _rows(wh.read(tgt).select("grp", "n", "total", "nu")) == _rows(direct())
