"""Incremental join-view maintenance (run_incremental_join_view):
maintained view == direct join of the current sources through
multi-DML windows on both sides, many-to-many fan-out, pure deletes,
crash-replay convergence, re-baseline, and the honest-limit raise."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators import materializations as mat
from edna_dbt_library_spark.operators.materializations import run_incremental_join_view
from edna_dbt_library_spark.sources import TableMeta, Warehouse, load_table


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _direct(wh, l, r, on):
    return wh.read(l).join(wh.read(r), on=on, how="inner")


def test_fact_dim_view_through_dml_windows(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_acctbal"
    )
    l = wh.relation("jv", "orders")
    r = wh.relation("jv", "cust")
    t = wh.relation("jv", "view")
    wh.create_as(l, orders.where("o_orderkey % 3 = 0"), TableMeta())
    wh.create_as(r, cust, TableMeta())

    out = run_incremental_join_view(wh, l, r, t, "o_orderkey", "custkey", ["custkey"])
    assert out["mode"] == "full"
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["custkey"]))

    # window 2: inserts + updates + deletes on the fact, updates on the dim
    wh.append(l, orders.where("o_orderkey % 3 = 1"))
    wh.update_where(l, "o_orderkey % 7 = 0", {"o_totalprice": "o_totalprice + 1.0"})
    wh.delete_where(l, "o_orderkey % 11 = 0")
    wh.update_where(r, "custkey % 5 = 0", {"c_acctbal": "c_acctbal * 2.0"})
    out = run_incremental_join_view(wh, l, r, t, "o_orderkey", "custkey", ["custkey"])
    assert out["mode"] == "delta"
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["custkey"]))

    # window 3: pure deletes on the dim side only (fan-out retirement)
    wh.delete_where(r, "custkey % 4 = 2")
    out = run_incremental_join_view(wh, l, r, t, "o_orderkey", "custkey", ["custkey"])
    assert out["mode"] == "delta"
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["custkey"]))

    # quiet window: no changes -> no pairs inserted, view unchanged
    before = _rows(wh.read(t))
    out = run_incremental_join_view(wh, l, r, t, "o_orderkey", "custkey", ["custkey"])
    assert out["mode"] == "delta" and out["n_pairs_inserted"] == 0
    assert _rows(wh.read(t)) == before


def test_many_to_many_delta_pairs(spark, tmp_path):
    """Both-sides-changed window: the dLi x dRi pairs must land exactly
    once (the step-2 full-left-side subtlety)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("jv", "l")
    r = wh.relation("jv", "r")
    t = wh.relation("jv", "v")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(9)], "l_id long, grp long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(6)], "r_id long, grp long, rv long"
        ),
        TableMeta(),
    )
    run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))

    # same window touches BOTH sides, including the same group
    wh.append(l, spark.createDataFrame([(20, 1, 777)], "l_id long, grp long, lv long"))
    wh.append(r, spark.createDataFrame([(200, 1, 888)], "r_id long, grp long, rv long"))
    wh.delete_where(l, "l_id = 1")
    run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    got = _rows(wh.read(t))
    assert got == _rows(_direct(wh, l, r, ["grp"]))
    # the new-new pair exists exactly once
    assert wh.read(t).where("l_id = 20 and r_id = 200").count() == 1


def test_crash_replay_converges(spark, tmp_path, monkeypatch):
    """Crash AFTER both applies but BEFORE the watermark promotion:
    the rerun replays the window; its delete masks retire the partial
    landings, so the view converges with no duplicates."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("jv", "l")
    r = wh.relation("jv", "r")
    t = wh.relation("jv", "v")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 2, i) for i in range(6)], "l_id long, grp long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(0, 0, 5), (1, 1, 6)], "r_id long, grp long, rv long"),
        TableMeta(),
    )
    run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])

    wh.append(l, spark.createDataFrame([(10, 0, 99)], "l_id long, grp long, lv long"))
    real = mat.Warehouse.set_snapshot_note

    def boom(self, rel, version, note):
        raise RuntimeError("crash before watermark promote")

    monkeypatch.setattr(mat.Warehouse, "set_snapshot_note", boom)
    with pytest.raises(RuntimeError):
        run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    monkeypatch.setattr(mat.Warehouse, "set_snapshot_note", real)

    # the crashed window's pairs may already be in the view; the rerun
    # must re-mask them, not double them
    run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))
    assert wh.read(t).where("l_id = 10").count() == 1


def test_rebaseline_and_overlap_raise(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("jv", "l")
    r = wh.relation("jv", "r")
    t = wh.relation("jv", "v")
    wh.create_as(
        l, spark.createDataFrame([(1, 1, 2)], "l_id long, grp long, lv long"), TableMeta()
    )
    wh.create_as(
        r, spark.createDataFrame([(9, 1, 3)], "r_id long, grp long, rv long"), TableMeta()
    )
    run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    # target dropped -> next run is a full rebuild, not a delta
    wh.drop(t)
    out = run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    assert out["mode"] == "full"
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))

    # ambiguous non-key columns raise (honest limit)
    bad = wh.relation("jv", "bad")
    wh.create_as(
        bad, spark.createDataFrame([(7, 1, 4)], "b_id long, grp long, lv long"), TableMeta()
    )
    with pytest.raises(ValueError, match="both sides"):
        run_incremental_join_view(
            wh, l, bad, wh.relation("jv", "v2"), "l_id", "b_id", ["grp"]
        )


# --- property fuzz: random DML windows on both sides ------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_SIDE_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("l_ins"), st.integers(0, 2)),
        st.tuples(st.just("l_del"), st.integers(0, 4)),
        st.tuples(st.just("l_upd"), st.integers(0, 4)),
        st.tuples(st.just("r_ins"), st.integers(0, 2)),
        st.tuples(st.just("r_del"), st.integers(0, 2)),
        st.tuples(st.just("r_upd"), st.integers(0, 2)),
    ),
    min_size=1,
    max_size=4,
)
_WINDOWS = st.lists(_SIDE_OPS, min_size=1, max_size=3)


@settings(max_examples=4, deadline=None)
@given(_WINDOWS)
def test_join_view_fuzz_matches_direct_join(spark, tmp_path_factory, windows):
    """Any interleaving of inserts/updates/deletes on either side,
    chopped into any window boundaries, must leave the maintained view
    equal to the direct join after every sync — the delta-join algebra
    has no op-order or window-shape dependence."""
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("jvfuzz")))
    l = wh.relation("f", "l")
    r = wh.relation("f", "r")
    t = wh.relation("f", "v")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(18)], "l_id long, grp long, lv long"
        ).coalesce(2),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(6)], "r_id long, grp long, rv long"
        ).coalesce(1),
        TableMeta(),
    )
    run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    next_l, next_r = 1000, 2000
    for ops in windows:
        for op, arg in ops:
            if op == "l_ins":
                wh.append(
                    l,
                    spark.createDataFrame(
                        [(next_l, arg, next_l)], "l_id long, grp long, lv long"
                    ),
                )
                next_l += 1
            elif op == "l_del":
                wh.delete_where(l, f"l_id % 5 = {arg}")
            elif op == "l_upd":
                wh.update_where(l, f"l_id % 5 = {arg}", {"lv": F.col("lv") + 1})
            elif op == "r_ins":
                wh.append(
                    r,
                    spark.createDataFrame(
                        [(next_r, arg, next_r)], "r_id long, grp long, rv long"
                    ),
                )
                next_r += 1
            elif op == "r_del":
                wh.delete_where(r, f"r_id % 3 = {arg}")
            elif op == "r_upd":
                wh.update_where(r, f"r_id % 3 = {arg}", {"rv": F.col("rv") + 1})
        run_incremental_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
        assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))


def test_stream_join_view_drain_equals_direct_join(spark, sf_dir, tmp_path):
    """A full drain of the streaming wrapper leaves the view equal to
    the direct join, with changes on BOTH sides riding a left-side
    trigger; a re-drain with nothing new is a no-op."""
    from edna_dbt_library_spark.streaming import stream_join_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("sv", "l")
    r = wh.relation("sv", "r")
    t = wh.relation("sv", "v")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(12)], "l_id long, grp long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(3)], "r_id long, grp long, rv long"
        ),
        TableMeta(),
    )
    cp = str(tmp_path / "cp")
    stream_join_view(wh, l, r, t, "l_id", "r_id", ["grp"], cp).awaitTermination(120)
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))

    # both sides change; only the left lands a new FILE (the trigger)
    wh.update_where(r, "r_id = 101", {"rv": F.lit(55)})
    wh.delete_where(r, "r_id = 102")
    wh.append(
        l, spark.createDataFrame([(50, 2, 5)], "l_id long, grp long, lv long")
    )
    stream_join_view(wh, l, r, t, "l_id", "r_id", ["grp"], cp).awaitTermination(120)
    got = _rows(wh.read(t))
    assert got == _rows(_direct(wh, l, r, ["grp"]))
    assert wh.read(t).where("rv = 55").count() > 0  # right-side update rode along

    # nothing new: drain is a no-op
    stream_join_view(wh, l, r, t, "l_id", "r_id", ["grp"], cp).awaitTermination(120)
    assert _rows(wh.read(t)) == got


def _direct_join_agg(wh, l, r, on, keys):
    return (
        wh.read(l)
        .join(wh.read(r), on=on, how="inner")
        .groupBy(*keys)
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def test_join_agg_view_through_dml_windows(spark, tmp_path):
    """The composed join-aggregate view (run_incremental_join_agg_view):
    maintained SELECT k, sum, count FROM l JOIN r USING (j) GROUP BY k
    == the direct join-aggregate through multi-DML windows on BOTH base
    tables — a dim-key move must re-group its fact rows, a deleted fact
    row must retract from its group, a dim delete must retract every
    joined contribution, and a group drained of pairs must disappear."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_join_agg_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("ja", "fact")
    r = wh.relation("ja", "dim")
    t = wh.relation("ja", "view")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 7, 10 * i) for i in range(60)],
            "fid long, j long, amt long",
        ).coalesce(2),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(j, j % 3) for j in range(7)], "j long, grp long"
        ),
        TableMeta(),
    )
    aggs = {"total": ("sum", "amt"), "n": ("count", "*")}
    s = run_incremental_join_agg_view(
        wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs
    )
    assert s["mode"] == "full" and s["join"]["mode"] == "full"
    assert wh.exists(wh.relation("ja", "view__join"))
    assert _rows(wh.read(t)) == _rows(_direct_join_agg(wh, l, r, ["j"], ["grp"]))

    # window: fact append + measure update + fact delete; dim group
    # move + dim delete (retracts a whole join fan-out)
    wh.append(
        l,
        spark.createDataFrame([(100, 1, 5), (101, 6, 7)], "fid long, j long, amt long"),
    )
    wh.update_where(l, "fid % 5 = 0", {"amt": "amt + 1"})
    wh.delete_where(l, "fid % 11 = 3")
    wh.update_where(r, "j = 2", {"grp": "9"})
    wh.delete_where(r, "j = 4")
    s = run_incremental_join_agg_view(
        wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs
    )
    assert s["mode"] == "delta" and s["join"]["mode"] == "delta"
    assert _rows(wh.read(t)) == _rows(_direct_join_agg(wh, l, r, ["j"], ["grp"]))

    # quiet window: both levels net zero
    s = run_incremental_join_agg_view(
        wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs
    )
    assert s["n_groups_upserted"] == 0 and s["join"]["n_pairs_inserted"] == 0
    assert _rows(wh.read(t)) == _rows(_direct_join_agg(wh, l, r, ["j"], ["grp"]))


def test_join_agg_view_crash_between_levels_converges(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER the join child lands but BEFORE the aggregate
    syncs heals on the next composed sync — level 2's child window
    covers both (the distinct view's crash contract, inherited)."""
    from edna_dbt_library_spark.operators import materializations as m
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_join_agg_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("ja", "f2")
    r = wh.relation("ja", "d2")
    t = wh.relation("ja", "v2")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 5, i) for i in range(30)], "fid long, j long, amt long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(j, j % 2) for j in range(5)], "j long, grp long"),
        TableMeta(),
    )
    aggs = {"total": ("sum", "amt"), "n": ("count", "*")}
    run_incremental_join_agg_view(wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs)

    wh.delete_where(l, "j = 1")
    real = m.run_incremental_agg_view

    def crashing(*a, **k):
        raise RuntimeError("crash between levels")

    monkeypatch.setattr(m, "run_incremental_agg_view", crashing)
    with pytest.raises(RuntimeError, match="between levels"):
        run_incremental_join_agg_view(
            wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs
        )
    monkeypatch.setattr(m, "run_incremental_agg_view", real)
    s = run_incremental_join_agg_view(
        wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs
    )
    assert s["join"]["n_pairs_inserted"] == 0  # level 1 already landed
    assert _rows(wh.read(t)) == _rows(_direct_join_agg(wh, l, r, ["j"], ["grp"]))


def test_stream_join_agg_view_drain_equals_direct(spark, tmp_path):
    """A full drain of the streaming join-aggregate wrapper leaves the
    view equal to the direct join-aggregate; DML on BOTH sides between
    drains rides the next trigger."""
    from edna_dbt_library_spark.streaming import stream_join_agg_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("ja", "f3")
    r = wh.relation("ja", "d3")
    t = wh.relation("ja", "v3")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 4, i) for i in range(24)], "fid long, j long, amt long"
        ).coalesce(2),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(j, j % 2) for j in range(4)], "j long, grp long"),
        TableMeta(),
    )
    aggs = {"total": ("sum", "amt"), "n": ("count", "*")}
    q = stream_join_agg_view(
        wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs, str(tmp_path / "cp")
    )
    q.awaitTermination()
    assert _rows(wh.read(t)) == _rows(_direct_join_agg(wh, l, r, ["j"], ["grp"]))
    wh.delete_where(r, "j = 3")  # quiet-left window: dim-only change
    wh.append(l, spark.createDataFrame([(100, 0, 9)], "fid long, j long, amt long"))
    q = stream_join_agg_view(
        wh, l, r, t, "fid", "j", ["j"], ["grp"], aggs, str(tmp_path / "cp")
    )
    q.awaitTermination()
    assert _rows(wh.read(t)) == _rows(_direct_join_agg(wh, l, r, ["j"], ["grp"]))


@settings(max_examples=3, deadline=None)
@given(_WINDOWS)
def test_join_agg_view_fuzz_matches_direct(spark, tmp_path_factory, windows):
    """Any interleaving of inserts/updates/deletes on either base,
    chopped into any window boundaries, must leave the COMPOSED
    join-aggregate view equal to the direct join-aggregate after every
    sync — the two-level stack inherits both levels' window-shape
    independence."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_join_agg_view,
    )

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("jafuzz")))
    l = wh.relation("f", "fl")
    r = wh.relation("f", "fr")
    t = wh.relation("f", "fv")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(18)], "l_id long, grp long, lv long"
        ).coalesce(2),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j % 2) for j in range(6)],
            "r_id long, grp long, seg long",
        ).coalesce(1),
        TableMeta(),
    )
    aggs = {"total": ("sum", "lv"), "n": ("count", "*")}

    def direct():
        return (
            wh.read(l)
            .join(wh.read(r), "grp")
            .groupBy("seg")
            .agg(
                F.sum("lv").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )

    run_incremental_join_agg_view(
        wh, l, r, t, "l_id", "r_id", ["grp"], ["seg"], aggs
    )
    next_l, next_r = 1000, 2000
    for ops in windows:
        for op, arg in ops:
            if op == "l_ins":
                wh.append(
                    l,
                    spark.createDataFrame(
                        [(next_l, arg, next_l)], "l_id long, grp long, lv long"
                    ),
                )
                next_l += 1
            elif op == "l_del":
                wh.delete_where(l, f"l_id % 5 = {arg}")
            elif op == "l_upd":
                wh.update_where(l, f"l_id % 5 = {arg}", {"lv": F.col("lv") + 1})
            elif op == "r_ins":
                wh.append(
                    r,
                    spark.createDataFrame(
                        [(next_r, arg, next_r % 2)],
                        "r_id long, grp long, seg long",
                    ),
                )
                next_r += 1
            elif op == "r_del":
                wh.delete_where(r, f"r_id % 3 = {arg}")
            elif op == "r_upd":
                # SEGMENT-moving dim update: the whole join fan-out must
                # retract from the old group and land in the new one
                wh.update_where(r, f"r_id % 3 = {arg}", {"seg": "1 - seg"})
        run_incremental_join_agg_view(
            wh, l, r, t, "l_id", "r_id", ["grp"], ["seg"], aggs
        )
        assert _rows(wh.read(t)) == _rows(direct())


# ---------------------------------------------------------------------------
# LEFT JOIN view (run_incremental_left_join_view)


def _direct_left(wh, l, r, on):
    return wh.read(l).join(wh.read(r), on=on, how="left")


def _rows_n(df):
    # None-safe total order (LEFT join outputs carry NULLs)
    return sorted(
        map(tuple, df.select(*sorted(df.columns)).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_left_join_view_through_dml_windows(spark, tmp_path):
    """The maintained LEFT join: unmatched left rows ride null-extended,
    a late-arriving dimension match RETRACTS the null-extension, the
    last match dying RE-LANDS it, and every window leaves the view
    equal to the direct LEFT JOIN."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_left_join_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("lj", "fact")
    r = wh.relation("lj", "dim")
    t = wh.relation("lj", "view")
    # keys 0..5 on the fact; the dim covers only 0..2 (3..5 unmatched)
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 6, i) for i in range(24)], "l_id long, k long, lv long"
        ).coalesce(2),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j, 10 * j) for j in range(3)], "r_id long, k long, rv long"
        ).coalesce(1),
        TableMeta(),
    )
    out = run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"])
    assert out["mode"] == "full"
    assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["k"]))
    assert wh.read(t).where("rv IS NULL").count() == 12  # k in 3..5

    # late-arriving dim rows: k=3 gains its FIRST match (null-extension
    # retracts), k=0 gains a SECOND match (fan-out widens)
    wh.append(
        r,
        spark.createDataFrame(
            [(103, 3, 30), (110, 0, 99)], "r_id long, k long, rv long"
        ),
    )
    out = run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"])
    assert out["mode"] == "delta" and out["n_rows_upserted"] > 0
    assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["k"]))
    assert wh.read(t).where("k = 3 AND rv IS NULL").count() == 0

    # the last match dies: k=1's rows must re-land null-extended;
    # one of k=0's two matches dies: fan-out narrows, no null rows
    wh.delete_where(r, "r_id = 101")
    wh.delete_where(r, "r_id = 110")
    out = run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"])
    assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["k"]))
    assert wh.read(t).where("k = 1 AND rv IS NULL").count() == 4
    assert wh.read(t).where("k = 0 AND rv IS NULL").count() == 0

    # fact DML: update moves a row to an unmatched key, delete retires
    wh.update_where(l, "l_id = 0", {"k": "5"})
    wh.delete_where(l, "l_id % 7 = 3")
    wh.append(
        l, spark.createDataFrame([(200, 2, 7)], "l_id long, k long, lv long")
    )
    out = run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"])
    assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["k"]))

    # quiet window
    before = _rows_n(wh.read(t))
    out = run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"])
    assert out["mode"] == "delta" and out["n_rows_upserted"] == 0
    assert _rows_n(wh.read(t)) == before


def test_left_join_view_null_keys_and_sigma(spark, tmp_path):
    """NULL join keys on the fact never match and stay null-extended
    through right-side DML; side predicates follow the σ contract — a
    dim row leaving the predicate kills its matches."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_left_join_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("lj", "f2")
    r = wh.relation("lj", "d2")
    t = wh.relation("lj", "v2")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(1, 0, 10), (2, None, 20), (3, 1, 30), (4, 2, 40)],
            "l_id long, k long, lv long",
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100, 0, 1, 5), (101, 1, 1, 6), (102, 2, 0, 7)],
            "r_id long, k long, live long, rv long",
        ),
        TableMeta(),
    )

    def direct():
        return wh.read(l).join(
            wh.read(r).where("live = 1").select("r_id", "k", "rv"),
            on=["k"],
            how="left",
        )

    kw = dict(right_where="live = 1", right_cols=["r_id", "k", "rv"])
    run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"], **kw)
    assert _rows_n(wh.read(t)) == _rows_n(direct())
    assert wh.read(t).where("l_id = 2").first()["rv"] is None
    assert wh.read(t).where("l_id = 4").first()["rv"] is None  # σ excludes

    # dim row ENTERS the predicate (gains match), another LEAVES it
    wh.update_where(r, "r_id = 102", {"live": "1"})
    wh.update_where(r, "r_id = 101", {"live": "0"})
    run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"], **kw)
    assert _rows_n(wh.read(t)) == _rows_n(direct())
    assert wh.read(t).where("l_id = 4").first()["rv"] == 7
    assert wh.read(t).where("l_id = 3").first()["rv"] is None
    assert wh.read(t).where("l_id = 2").first()["rv"] is None


@settings(max_examples=4, deadline=None)
@given(_WINDOWS)
def test_left_join_view_fuzz_matches_direct(spark, tmp_path_factory, windows):
    """Any interleaving of inserts/updates/deletes on either side must
    leave the maintained LEFT view equal to the direct LEFT JOIN after
    every sync — including matches dying to null-extension and back."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_left_join_view,
    )

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("ljfuzz")))
    l = wh.relation("f", "ll")
    r = wh.relation("f", "lr")
    t = wh.relation("f", "lv")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 5, i) for i in range(18)], "l_id long, grp long, lv long"
        ).coalesce(2),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(5)], "r_id long, grp long, rv long"
        ).coalesce(1),
        TableMeta(),
    )
    run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
    next_l, next_r = 1000, 2000
    for ops in windows:
        for op, arg in ops:
            if op == "l_ins":
                wh.append(
                    l,
                    spark.createDataFrame(
                        [(next_l, arg + 3, next_l)], "l_id long, grp long, lv long"
                    ),
                )
                next_l += 1
            elif op == "l_del":
                wh.delete_where(l, f"l_id % 5 = {arg}")
            elif op == "l_upd":
                wh.update_where(l, f"l_id % 5 = {arg}", {"lv": F.col("lv") + 1})
            elif op == "r_ins":
                wh.append(
                    r,
                    spark.createDataFrame(
                        [(next_r, arg, next_r)], "r_id long, grp long, rv long"
                    ),
                )
                next_r += 1
            elif op == "r_del":
                wh.delete_where(r, f"r_id % 3 = {arg}")
            elif op == "r_upd":
                wh.update_where(r, f"r_id % 3 = {arg}", {"rv": F.col("rv") + 1})
        run_incremental_left_join_view(wh, l, r, t, "l_id", "r_id", ["grp"])
        assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["grp"]))


def test_stream_join_view_quiet_side_only_window_syncs(spark, tmp_path):
    """ADVICE r12 #2: with the default BOTH-SIDES union trigger, a
    window that touched ONLY the right table still fires a micro-batch
    and the drain leaves the view equal to the direct join (the
    one-side trigger used to emit zero batches here); same for the
    composed join-aggregate wrapper."""
    from edna_dbt_library_spark.streaming import (
        stream_join_agg_view,
        stream_join_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("qs", "l")
    r = wh.relation("qs", "r")
    t = wh.relation("qs", "v")
    ta = wh.relation("qs", "av")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(12)], "l_id long, grp long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(3)], "r_id long, grp long, rv long"
        ),
        TableMeta(),
    )
    cp1, cp2 = str(tmp_path / "cp1"), str(tmp_path / "cp2")
    stream_join_view(wh, l, r, t, "l_id", "r_id", ["grp"], cp1).awaitTermination(120)
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))
    aggs = {"total": ("sum", "lv"), "n": ("count", "*")}
    stream_join_agg_view(
        wh, l, r, ta, "l_id", "r_id", ["grp"], ["rv"], aggs, cp2
    ).awaitTermination(120)

    # RIGHT-side-only window: a new dim row (new FILE on r, none on l)
    wh.append(
        r, spark.createDataFrame([(200, 1, 77)], "r_id long, grp long, rv long")
    )
    stream_join_view(wh, l, r, t, "l_id", "r_id", ["grp"], cp1).awaitTermination(120)
    assert _rows(wh.read(t)) == _rows(_direct(wh, l, r, ["grp"]))
    assert wh.read(t).where("rv = 77").count() > 0

    stream_join_agg_view(
        wh, l, r, ta, "l_id", "r_id", ["grp"], ["rv"], aggs, cp2
    ).awaitTermination(120)
    direct = (
        wh.read(l)
        .join(wh.read(r), "grp")
        .groupBy("rv")
        .agg(F.sum("lv").alias("total"), F.count(F.lit(1)).cast("long").alias("n"))
    )
    assert _rows(wh.read(ta)) == _rows(direct)


def test_stream_left_join_view_drain_equals_direct(spark, tmp_path):
    """A full drain of the streaming LEFT-join wrapper equals the direct
    LEFT JOIN; a right-side-only window (late-arriving dim) fires via
    the default both-sides union trigger and retracts the
    null-extension."""
    from edna_dbt_library_spark.streaming import stream_left_join_view

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("sl", "l")
    r = wh.relation("sl", "r")
    t = wh.relation("sl", "v")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 4, i) for i in range(8)], "l_id long, k long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(100, 0, 5)], "r_id long, k long, rv long"),
        TableMeta(),
    )
    cp = str(tmp_path / "cp")
    stream_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"], cp).awaitTermination(120)
    assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["k"]))
    assert wh.read(t).where("rv IS NULL").count() == 6

    # right-only window: k=1 gains its first match
    wh.append(r, spark.createDataFrame([(101, 1, 6)], "r_id long, k long, rv long"))
    stream_left_join_view(wh, l, r, t, "l_id", "r_id", ["k"], cp).awaitTermination(120)
    assert _rows_n(wh.read(t)) == _rows_n(_direct_left(wh, l, r, ["k"]))
    assert wh.read(t).where("k = 1 AND rv IS NULL").count() == 0


def test_multiway_chain_crash_between_levels_converges(spark, tmp_path):
    """A crash AFTER the first join child synced but BEFORE the second
    (injected at the second child's watermark promote) leaves the chain
    torn mid-level; the next composed sync must cover the gap — the
    second child's window spans both attempts — and converge to the
    direct 3-way join-aggregate."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_join_agg_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    f = wh.relation("mc", "f")
    d1 = wh.relation("mc", "d1")
    d2 = wh.relation("mc", "d2")
    t = wh.relation("mc", "v")
    wh.create_as(
        f,
        spark.createDataFrame(
            [(i, i % 3, i % 2, i) for i in range(18)],
            "fid long, j1 long, j2 long, amt long",
        ),
        TableMeta(),
    )
    wh.create_as(
        d1, spark.createDataFrame([(j, j * 10) for j in range(3)], "j1 long, a long"),
        TableMeta(),
    )
    wh.create_as(
        d2, spark.createDataFrame([(j, 100 + j) for j in range(2)], "j2 long, b long"),
        TableMeta(),
    )
    dims = [{"rel": d2, "id": "j2", "on": ["j2"], "where": None, "cols": None}]
    aggs = {"total": ("sum", "amt"), "n": ("count", "*")}

    def sync():
        return run_incremental_join_agg_view(
            wh, f, d1, t, "fid", "j1", ["j1"], ["a", "b"], aggs, dims=dims
        )

    def direct():
        return (
            wh.read(f)
            .join(wh.read(d1), "j1")
            .join(wh.read(d2), "j2")
            .groupBy("a", "b")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )

    sync()
    assert _rows(wh.read(t)) == _rows(direct())

    # window touching all three bases, then crash at child2's promote
    wh.update_where(f, "fid % 4 = 0", {"amt": "amt + 7"})
    wh.update_where(d1, "j1 = 1", {"a": "99"})
    wh.update_where(d2, "j2 = 0", {"b": "888"})
    child2 = wh.relation("mc", "v__join2")
    orig = wh.set_snapshot_note

    def crashing(rel, v, note):
        if note.startswith(f"joinview:{child2.table_id}:"):
            raise RuntimeError("injected crash mid-chain")
        return orig(rel, v, note)

    wh.set_snapshot_note = crashing
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="mid-chain"):
            sync()
    finally:
        wh.set_snapshot_note = orig
    # the replayed composed sync covers the torn window and converges
    sync()
    assert _rows(wh.read(t)) == _rows(direct())
    # and a quiet re-sync holds
    before = _rows(wh.read(t))
    sync()
    assert _rows(wh.read(t)) == before
