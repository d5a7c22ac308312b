"""SQL DML statements over the warehouse (sources/sql_dml.py): the
reference's user surface is SQL-first (incremental_partition_merge.sql
compiles MERGE/DELETE statements), so every merge-on-read DML operator
has a statement form in Warehouse.sql. Each statement must run the
IDENTICAL operator the DataFrame API runs — the equivalence tests here
build twin tables and assert final-state equality."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.sources import TableMeta, Warehouse
from edna_dbt_library_spark.sources.sql_dml import _split_top, _top_kw_split


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _table(spark, wh, name="t", partitioned=False):
    rel = wh.relation("s", name)
    meta = TableMeta(partition_by="p") if partitioned else TableMeta()
    df = spark.createDataFrame(
        [(k, f"v{k}", 10 * k, "a" if k < 10 else "b") for k in range(20)],
        "k long, v string, amt long, p string",
    ).coalesce(2)
    wh.create_as(rel, df, meta)
    return rel


def _rows(wh, rel):
    return sorted(
        tuple(r) for r in wh.read(rel).select("k", "v", "amt", "p").collect()
    )


# --- parsing helpers ------------------------------------------------------


def test_split_top_respects_parens_and_quotes():
    assert _split_top("a = f(x, y), b = 'p,q', c = 1", ",") == [
        "a = f(x, y)",
        " b = 'p,q'",
        " c = 1",
    ]


def test_top_kw_split_skips_nested_and_quoted():
    before, after = _top_kw_split("x = 'where' and f(1) where k > 2", "where")
    assert after == " k > 2" and before.rstrip().endswith("f(1)")
    assert _top_kw_split("no clause here_where", "where") == (
        "no clause here_where",
        None,
    )


# --- DELETE ---------------------------------------------------------------


def test_sql_delete_equals_delete_where(spark, wh):
    """The verdict's done-criterion: SQL DELETE == delete_where on the
    same scratch table."""
    a, b = _table(spark, wh, "a"), _table(spark, wh, "b")
    stats = wh.sql(
        "DELETE FROM s__a WHERE amt >= 50 AND p = 'a'", {"s__a": a}
    ).first()
    r = wh.delete_where(b, "amt >= 50 AND p = 'a'")
    assert stats["operation"] == "delete"
    assert stats["n_rows"] == r["n_deleted"] == 5
    assert _rows(wh, a) == _rows(wh, b)


def test_sql_delete_without_where_deletes_all(spark, wh):
    rel = _table(spark, wh)
    assert wh.sql("DELETE FROM s__t", {"s__t": rel}).first()["n_rows"] == 20
    assert wh.read(rel).count() == 0


def test_sql_delete_rejects_subquery_predicate(spark, wh):
    rel = _table(spark, wh)
    with pytest.raises(ValueError, match="row-local"):
        wh.sql(
            "DELETE FROM s__t WHERE k IN (SELECT k FROM s__t)", {"s__t": rel}
        )


# --- UPDATE ---------------------------------------------------------------


def test_sql_update_equals_update_where(spark, wh):
    a, b = _table(spark, wh, "a"), _table(spark, wh, "b")
    stats = wh.sql(
        "UPDATE s__a SET amt = amt + 5, v = concat(v, ',x') WHERE k < 3",
        {"s__a": a},
    ).first()
    r = wh.update_where(
        b, "k < 3", {"amt": "amt + 5", "v": "concat(v, ',x')"}
    )
    assert stats["n_rows"] == r["n_updated"] == 3
    assert _rows(wh, a) == _rows(wh, b)
    assert (1, "v1,x", 15, "a") in _rows(wh, a)


def test_sql_update_without_where_touches_all(spark, wh):
    rel = _table(spark, wh)
    assert (
        wh.sql("UPDATE s__t SET amt = 0", {"s__t": rel}).first()["n_rows"]
        == 20
    )
    assert wh.read(rel).agg(F.sum("amt")).first()[0] == 0


def test_sql_update_bad_assignment_raises(spark, wh):
    rel = _table(spark, wh)
    with pytest.raises(ValueError, match="assignment"):
        wh.sql("UPDATE s__t SET WHERE k = 1", {"s__t": rel})
    with pytest.raises(ValueError, match="twice"):
        wh.sql("UPDATE s__t SET amt = 1, amt = 2", {"s__t": rel})


# --- INSERT ---------------------------------------------------------------


def test_sql_insert_select_aligns_reordered_columns(spark, wh):
    rel = _table(spark, wh)
    stats = wh.sql(
        "INSERT INTO s__t SELECT p, 1000 AS amt, 'vnew' AS v, 99 AS k "
        "FROM s__t WHERE k = 0",
        {"s__t": rel},
    ).first()
    assert stats["n_rows"] == 1
    assert (99, "vnew", 1000, "a") in _rows(wh, rel)


def test_sql_insert_values_positional_and_column_list(spark, wh):
    rel = _table(spark, wh)
    wh.sql("INSERT INTO s__t VALUES (100, 'a', 7, 'b')", {"s__t": rel})
    assert (100, "a", 7, "b") in _rows(wh, rel)
    wh.sql(
        "INSERT INTO s__t (amt, k, v, p) VALUES (8, 101, 'z', 'b')",
        {"s__t": rel},
    )
    assert (101, "z", 8, "b") in _rows(wh, rel)
    with pytest.raises(ValueError, match="arity"):
        wh.sql("INSERT INTO s__t VALUES (1, 2)", {"s__t": rel})


def test_sql_insert_overwrite_partitioned_replaces_touched_only(spark, wh):
    rel = _table(spark, wh, partitioned=True)
    stats = wh.sql(
        "INSERT OVERWRITE s__t SELECT 500 AS k, 'ow' AS v, 1 AS amt, "
        "'a' AS p",
        {"s__t": rel},
    ).first()
    assert stats["operation"] == "insert_overwrite" and stats["n_rows"] == 1
    rows = _rows(wh, rel)
    # partition a replaced by the single row; partition b untouched
    assert [r for r in rows if r[3] == "a"] == [(500, "ow", 1, "a")]
    assert len([r for r in rows if r[3] == "b"]) == 10


def test_sql_insert_overwrite_unpartitioned_replaces_all(spark, wh):
    rel = _table(spark, wh)
    wh.sql(
        "INSERT OVERWRITE TABLE s__t VALUES (9, 'only', 0, 'z')",
        {"s__t": rel},
    )
    assert _rows(wh, rel) == [(9, "only", 0, "z")]


def test_sql_insert_derives_partition_from_source(spark, wh):
    rel = wh.relation("s", "pd")
    df = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00")], "k long, ts string"
    ).withColumns(
        {
            "ts": F.to_timestamp("ts"),
            "_pdate": F.to_date(F.to_timestamp("ts")),
        }
    )
    wh.create_as(
        rel, df, TableMeta(partition_by="_pdate", partition_source="ts")
    )
    wh.sql(
        "INSERT INTO s__pd SELECT 2 AS k, timestamp'2024-02-06 01:00:00' AS ts",
        {"s__pd": rel},
    )
    got = {
        (r["k"], str(r["_pdate"])) for r in wh.read(rel).collect()
    }
    assert got == {(1, "2024-01-05"), (2, "2024-02-06")}


# --- MERGE ----------------------------------------------------------------


def test_sql_merge_upserts_like_delete_matching_plus_append(spark, wh):
    rel = _table(spark, wh, partitioned=True)
    stats = wh.sql(
        "MERGE INTO s__t t USING (SELECT 1 AS k, 'upd' AS v, -1 AS amt, "
        "'a' AS p UNION ALL SELECT 99, 'new', -2, 'b') s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        {"s__t": rel},
    ).first()
    assert stats["operation"] == "merge" and stats["n_rows"] == 2
    rows = _rows(wh, rel)
    assert (1, "upd", -1, "a") in rows and (99, "new", -2, "b") in rows
    assert (1, "v1", 10, "a") not in rows
    assert len(rows) == 21


def test_sql_merge_table_source_and_composite_keys(spark, wh):
    rel = _table(spark, wh)
    src = wh.relation("s", "delta")
    wh.create_as(
        src,
        wh.read(rel).where("k in (2, 3)").withColumn("amt", F.lit(0)),
        TableMeta(),
    )
    stats = wh.sql(
        "MERGE INTO s__t AS t USING s__delta AS d ON t.k = d.k AND t.p = d.p "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        {"s__t": rel, "s__delta": src},
    ).first()
    assert stats["n_rows"] == 2
    rows = _rows(wh, rel)
    assert (2, "v2", 0, "a") in rows and (3, "v3", 0, "a") in rows
    assert len(rows) == 20


def test_sql_merge_rejects_nonunique_source_and_rich_clauses(spark, wh):
    rel = _table(spark, wh)
    with pytest.raises(ValueError, match="not unique"):
        wh.sql(
            "MERGE INTO s__t t USING (SELECT 1 AS k, 'a' AS v, 0 AS amt, "
            "'a' AS p UNION ALL SELECT 1, 'b', 0, 'a') s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
            {"s__t": rel},
        )
    with pytest.raises(ValueError, match="UPDATE SET \\*"):
        wh.sql(
            "MERGE INTO s__t t USING s__t s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE",
            {"s__t": rel},
        )
    with pytest.raises(ValueError, match="target-qualified"):
        wh.sql(
            "MERGE INTO s__t t USING (SELECT 1 AS k) s ON x.k = y.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
            {"s__t": rel},
        )
    # a t.k = t.k typo with an UNALIASED subquery source must refuse
    # (trivially true in real SQL; previously ran as a plain k-upsert)
    with pytest.raises(ValueError, match="target-qualified"):
        wh.sql(
            "MERGE INTO s__t t USING (SELECT 1 AS k) ON t.k = t.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
            {"s__t": rel},
        )


# --- CREATE TABLE AS / DROP TABLE -----------------------------------------


def test_sql_create_table_as_and_drop(spark, wh):
    rel = _table(spark, wh)
    stats = wh.sql(
        "CREATE TABLE s__agg PARTITIONED BY (p) AS "
        "SELECT p, sum(amt) AS total FROM s__t GROUP BY p",
        {"s__t": rel},
    ).first()
    assert stats["operation"] == "create_table_as" and stats["n_rows"] == 2
    agg = wh.relation("s", "agg")
    got = {(r["p"], r["total"]) for r in wh.read(agg).collect()}
    assert got == {("a", sum(10 * k for k in range(10))),
                   ("b", sum(10 * k for k in range(10, 20)))}
    assert wh.read_meta(agg).partition_by == "p"
    with pytest.raises(ValueError, match="exists"):
        wh.sql("CREATE TABLE s__agg AS SELECT 1 AS x", {"s__t": rel})
    wh.sql(
        "CREATE OR REPLACE TABLE s__agg AS SELECT 1 AS x", {"s__t": rel}
    )
    assert wh.read(agg).columns == ["x"]
    assert wh.sql("DROP TABLE s__agg", {}).first()["operation"] == "drop_table"
    assert not wh.exists(agg)
    assert wh.sql("DROP TABLE IF EXISTS s__agg", {}).first()["n_rows"] == 0
    with pytest.raises(ValueError, match="does not exist"):
        wh.sql("DROP TABLE s__agg", {})


def test_sql_dml_unknown_alias_raises(spark, wh):
    _table(spark, wh)
    with pytest.raises(ValueError, match="unknown table alias"):
        wh.sql("DELETE FROM nope WHERE k = 1", {})


def test_sql_select_still_works_after_dml_dispatch(spark, wh):
    rel = _table(spark, wh)
    wh.sql("DELETE FROM s__t WHERE k >= 10", {"s__t": rel})
    assert (
        wh.sql("SELECT count(*) AS n FROM s__t", {"s__t": rel}).first()["n"]
        == 10
    )


def test_non_table_create_drop_pass_through(spark, wh):
    """DML_HEAD_RE routes ONLY the implemented statement forms
    (ADVICE r9 #4): CREATE [TEMP] VIEW and DROP VIEW are ordinary Spark
    SQL that worked through Warehouse.sql before the DML grammar landed
    and must keep passing through — not die in the constrained parser."""
    from edna_dbt_library_spark.sources.sql_dml import DML_HEAD_RE

    # routing table: implemented forms match, everything else falls through
    assert DML_HEAD_RE.match("CREATE TABLE s__x AS SELECT 1 AS a")
    assert DML_HEAD_RE.match("create or replace table s__x as select 1 a")
    assert DML_HEAD_RE.match("DROP TABLE IF EXISTS s__x")
    assert DML_HEAD_RE.match("  delete from s__t where k = 1")
    for q in (
        "CREATE TEMP VIEW tv AS SELECT 1 AS a",
        "CREATE OR REPLACE TEMPORARY VIEW tv AS SELECT 1 AS a",
        "CREATE VIEW v AS SELECT 1 AS a",
        "DROP VIEW IF EXISTS tv",
        "CREATE FUNCTION f AS 'x'",
    ):
        assert not DML_HEAD_RE.match(q), q

    # end-to-end: a temp view created through Warehouse.sql is usable
    # (self-contained body: warehouse aliases are dropped after the call,
    # and Spark re-resolves a temp view's text on every reference)
    rel = _table(spark, wh)
    wh.sql("CREATE OR REPLACE TEMP VIEW _sqldml_tv AS SELECT 1 AS a, 2 AS b", {})
    assert spark.sql("SELECT a + b AS s FROM _sqldml_tv").first()["s"] == 3
    wh.sql("DROP VIEW _sqldml_tv", {})
    assert not spark.catalog.tableExists("_sqldml_tv")
    # and the routed forms still dispatch to the DML grammar
    out = wh.sql("DELETE FROM s__t WHERE k = 0", {"s__t": rel}).first()
    assert out["operation"] == "delete" and out["n_rows"] == 1


# --- materialized views (join-view IVM, SQL face) ---------------------------


def _mv_tables(spark, wh):
    l = wh.relation("s", "mvl")
    r = wh.relation("s", "mvr")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(12)], "l_id long, grp long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(5)], "r_id long, grp long, rv long"
        ),
        TableMeta(),
    )
    return l, r


def _pairs(wh, rel):
    return sorted(
        tuple(x) for x in wh.read(rel).select("grp", "l_id", "r_id", "lv", "rv").collect()
    )


def test_create_and_refresh_materialized_view(spark, wh):
    l, r = _mv_tables(spark, wh)
    out = wh.sql(
        "CREATE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    ).first()
    assert out["operation"] == "create_materialized_view"
    mv = wh.relation("s", "mv")
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(l)
        .join(wh.read(r), "grp")
        .select("grp", "l_id", "r_id", "lv", "rv")
        .collect()
    )
    assert _pairs(wh, mv) == direct()

    # DML on both sides, then REFRESH = one delta sync
    wh.sql("DELETE FROM s__mvr WHERE r_id = 101")
    wh.sql("UPDATE s__mvl SET lv = lv + 1 WHERE l_id % 4 = 0")
    wh.append(
        l, spark.createDataFrame([(50, 1, 500)], "l_id long, grp long, lv long")
    )
    out = wh.sql("REFRESH MATERIALIZED VIEW s__mv").first()
    assert out["operation"] == "refresh_materialized_view" and out["n_rows"] > 0
    assert _pairs(wh, mv) == direct()

    # quiet window refreshes to the same state with zero pairs landed
    out = wh.sql("REFRESH MATERIALIZED VIEW s__mv").first()
    assert out["n_rows"] == 0
    assert _pairs(wh, mv) == direct()


def test_materialized_view_guards(spark, wh):
    l, r = _mv_tables(spark, wh)
    wh.sql(
        "CREATE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    )
    # duplicate create without OR REPLACE raises; OR REPLACE rebuilds
    with pytest.raises(ValueError, match="exists"):
        wh.sql(
            "CREATE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
            "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
        )
    wh.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    )
    # refresh of a non-MV raises; a dropped MV sheds its definition
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__mvl")
    wh.sql("DROP TABLE s__mv")
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__mv")
    # richer SELECT forms raise with a pointer, never mis-execute
    with pytest.raises(ValueError, match="cannot parse"):
        wh.sql(
            "CREATE MATERIALIZED VIEW s__mv2 UNIQUE KEYS (l_id, r_id) "
            "AS SELECT l_id FROM s__mvl JOIN s__mvr USING (grp)"
        )


def test_create_and_refresh_aggregate_materialized_view(spark, wh):
    src = wh.relation("s", "agsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, 10 * i) for i in range(12)], "id long, grp long, amt long"
        ),
        TableMeta(),
    )
    out = wh.sql(
        "CREATE MATERIALIZED VIEW s__agv AS "
        "SELECT grp, sum(amt) AS total, count(*) AS n_rows "
        "FROM s__agsrc GROUP BY grp"
    ).first()
    assert out["operation"] == "create_materialized_view" and out["n_rows"] == 3
    mv = wh.relation("s", "agv")
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(src)
        .groupBy("grp")
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .collect()
    )
    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "total", "n_rows").collect()
    )
    assert view() == direct()

    # DML window: update + delete (one group drained to zero) + insert
    wh.sql("UPDATE s__agsrc SET amt = amt + 5 WHERE id % 4 = 0")
    wh.sql("DELETE FROM s__agsrc WHERE grp = 1")
    wh.append(
        src, spark.createDataFrame([(50, 0, 7)], "id long, grp long, amt long")
    )
    out = wh.sql("REFRESH MATERIALIZED VIEW s__agv").first()
    assert out["operation"] == "refresh_materialized_view" and out["n_rows"] > 0
    assert view() == direct()
    assert wh.read(mv).where("grp = 1").count() == 0

    # quiet window
    out = wh.sql("REFRESH MATERIALIZED VIEW s__agv").first()
    assert out["n_rows"] == 0 and view() == direct()

    # bad specs raise BEFORE touching the existing view
    with pytest.raises(ValueError, match="count"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__agv AS "
            "SELECT grp, sum(amt) AS total FROM s__agsrc GROUP BY grp"
        )
    with pytest.raises(ValueError, match="cannot parse SELECT item"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__agv AS "
            "SELECT grp, median(amt) AS a, count(*) AS n "
            "FROM s__agsrc GROUP BY grp"
        )
    assert view() == direct()  # untouched by the failed replaces

    # DROP sheds the aggview watermark on the source
    tid = mv.table_id
    assert _wm_notes(wh, src, f"aggview:{tid}")
    wh.sql("DROP TABLE s__agv")
    assert not _wm_notes(wh, src, f"aggview:{tid}")


def _wm_notes(wh, rel, prefix):
    return [
        s["note"]
        for s in wh.list_snapshots(rel)
        if (s.get("note") or "").startswith(prefix)
    ]


def test_mview_lifecycle_sheds_definition_and_watermarks(spark, wh):
    l, r = _mv_tables(spark, wh)
    wh.sql(
        "CREATE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    )
    tid = wh.relation("s", "mv").table_id
    pre = f"joinview:{tid}:"
    assert _wm_notes(wh, l, pre) and _wm_notes(wh, r, pre)

    # CREATE TABLE over the mview name: definition + pinned watermarks
    # shed, so a later REFRESH raises instead of running the IVM delta
    # path against user data (ADVICE r10 #1)
    wh.sql("CREATE OR REPLACE TABLE s__mv AS SELECT 1 AS k")
    assert not _wm_notes(wh, l, pre) and not _wm_notes(wh, r, pre)
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__mv")

    # DROP TABLE of an mview drops the sources' pinned watermark
    # snapshots too — they retain deleted rows forever otherwise
    # (ADVICE r10 #2)
    wh.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    )
    assert _wm_notes(wh, l, pre)
    wh.sql("DROP TABLE s__mv")
    assert not _wm_notes(wh, l, pre) and not _wm_notes(wh, r, pre)


def test_filtered_projected_materialized_view(spark, wh):
    """The r10 verdict's 'a real user's first MV will have a WHERE
    clause': each join side may be a row-local derived table — the
    projection + filter are maintained incrementally, including
    updates that move rows ACROSS the predicate boundary in both
    directions."""
    l, r = _mv_tables(spark, wh)
    wh.sql(
        "CREATE MATERIALIZED VIEW s__fmv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM (SELECT l_id, grp, lv FROM s__mvl WHERE lv >= 20) "
        "JOIN (SELECT r_id, grp FROM s__mvr WHERE r_id != 103) USING (grp)"
    )
    mv = wh.relation("s", "fmv")
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(l)
        .where("lv >= 20")
        .select("l_id", "grp", "lv")
        .join(wh.read(r).where("r_id != 103").select("r_id", "grp"), "grp")
        .select("grp", "l_id", "lv", "r_id")
        .collect()
    )
    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "l_id", "lv", "r_id").collect()
    )
    assert view() == direct()
    assert wh.read(mv).columns == ["grp", "l_id", "lv", "r_id"]

    # window: one row leaves the predicate (pairs must retire), one
    # enters (pairs must land), plus a right delete and a left append
    wh.sql("UPDATE s__mvl SET lv = 5 WHERE l_id = 6")    # 60 -> out
    wh.sql("UPDATE s__mvl SET lv = 100 WHERE l_id = 1")  # 10 -> in
    wh.sql("DELETE FROM s__mvr WHERE r_id = 102")
    wh.append(
        l, spark.createDataFrame([(50, 1, 500)], "l_id long, grp long, lv long")
    )
    out = wh.sql("REFRESH MATERIALIZED VIEW s__fmv").first()
    assert out["n_rows"] > 0
    assert view() == direct()
    assert not any(x[1] == 6 for x in view())  # left the predicate
    assert any(x[1] == 1 for x in view())      # entered it

    # quiet window converges
    assert wh.sql("REFRESH MATERIALIZED VIEW s__fmv").first()["n_rows"] == 0
    assert view() == direct()


def test_filtered_aggregate_materialized_view(spark, wh):
    src = wh.relation("s", "fagsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, 10 * i) for i in range(12)], "id long, grp long, amt long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__fagv AS "
        "SELECT grp, sum(amt) AS total, count(*) AS n_rows "
        "FROM s__fagsrc WHERE amt >= 30 GROUP BY grp"
    )
    mv = wh.relation("s", "fagv")
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(src)
        .where("amt >= 30")
        .groupBy("grp")
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .collect()
    )
    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "total", "n_rows").collect()
    )
    assert view() == direct()

    # rows cross the predicate both ways; one group drains out of σ
    wh.sql("UPDATE s__fagsrc SET amt = 1 WHERE id = 4")     # 40 -> out
    wh.sql("UPDATE s__fagsrc SET amt = 90 WHERE id = 2")    # 20 -> in
    wh.sql("DELETE FROM s__fagsrc WHERE grp = 1 AND amt >= 30")
    wh.append(
        src, spark.createDataFrame([(50, 1, 7)], "id long, grp long, amt long")
    )  # appended row is BELOW the predicate: must not appear
    out = wh.sql("REFRESH MATERIALIZED VIEW s__fagv").first()
    assert out["operation"] == "refresh_materialized_view"
    assert view() == direct()
    assert wh.read(mv).where("grp = 1").count() == 0  # retracted group

    assert wh.sql("REFRESH MATERIALIZED VIEW s__fagv").first()["n_rows"] == 0
    assert view() == direct()


def test_mv_side_guards_validate_before_shed(spark, wh):
    """A bad derived-table spec must raise BEFORE the existing view's
    definition is shed — the OR REPLACE failure mode ADVICE r10 #1
    guarded for the create path applies to side specs too."""
    l, r = _mv_tables(spark, wh)
    wh.sql(
        "CREATE MATERIALIZED VIEW s__gmv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    )
    # projection dropping the side's id
    with pytest.raises(ValueError, match="must keep"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__gmv UNIQUE KEYS (l_id, r_id) "
            "AS SELECT * FROM (SELECT grp, lv FROM s__mvl) "
            "JOIN s__mvr USING (grp)"
        )
    # predicate that does not analyze
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__gmv UNIQUE KEYS (l_id, r_id) "
            "AS SELECT * FROM (SELECT * FROM s__mvl WHERE no_such_col > 1) "
            "JOIN s__mvr USING (grp)"
        )
    # computed projections point to the DataFrame API
    with pytest.raises(ValueError, match="bare column names"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__gmv UNIQUE KEYS (l_id, r_id) "
            "AS SELECT * FROM (SELECT l_id, grp, lv + 1 FROM s__mvl) "
            "JOIN s__mvr USING (grp)"
        )
    # the original definition survived every failed replace
    wh.sql("DELETE FROM s__mvr WHERE r_id = 104")
    assert wh.sql("REFRESH MATERIALIZED VIEW s__gmv").first()["n_rows"] >= 0
    # agg form: bad predicate raises before shed too
    src = wh.relation("s", "gsrc")
    wh.create_as(
        src,
        spark.createDataFrame([(1, 1, 1)], "id long, grp long, amt long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__gagv AS SELECT grp, sum(amt) AS t, "
        "count(*) AS n FROM s__gsrc GROUP BY grp"
    )
    with pytest.raises(AnalysisException):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__gagv AS SELECT grp, "
            "sum(amt) AS t, count(*) AS n FROM s__gsrc WHERE nope = 1 "
            "GROUP BY grp"
        )
    assert wh.sql("REFRESH MATERIALIZED VIEW s__gagv").first()["n_rows"] == 0


def test_time_bucketed_continuous_aggregate_mview(spark, wh):
    """SQL face of the changelog-driven continuous aggregate: a
    time_bucket(ts, us) derived key in the aggregate MV form —
    deletes retract from, and ts-moving updates re-land in, the right
    bucket; REFRESH maintains it off the changelog."""
    src = wh.relation("s", "tsev")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 2, 3600 * (i % 3) + i, 10 * i + 1) for i in range(18)],
            "id long, grp long, sec long, amt long",
        ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__tshr AS "
        "SELECT grp, time_bucket(ts, 3600000000) AS bucket, "
        "sum(amt) AS total, count(*) AS n_rows "
        "FROM s__tsev GROUP BY grp, bucket"
    )
    mv = wh.relation("s", "tshr")
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(src)
        .withColumn("bucket", F.expr("unix_micros(ts) div 3600000000"))
        .groupBy("grp", "bucket")
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .collect()
    )
    view = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(mv).select("grp", "bucket", "total", "n_rows").collect()
    )
    assert view() == direct()

    wh.sql("UPDATE s__tsev SET ts = ts + INTERVAL 2 HOURS WHERE id = 1")
    wh.sql("DELETE FROM s__tsev WHERE id % 3 = 2")
    wh.append(
        src,
        spark.createDataFrame([(50, 0, 7)], "id long, grp long, amt long")
        .withColumn("ts", F.timestamp_seconds(F.lit(3600 * 8))),
    )
    out = wh.sql("REFRESH MATERIALIZED VIEW s__tshr").first()
    assert out["operation"] == "refresh_materialized_view"
    assert view() == direct()
    assert wh.sql("REFRESH MATERIALIZED VIEW s__tshr").first()["n_rows"] == 0

    # a derived key not named in GROUP BY raises, pre-shed
    with pytest.raises(ValueError, match="must appear in GROUP BY"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__tshr AS "
            "SELECT grp, time_bucket(ts, 3600000000) AS b, "
            "sum(amt) AS total, count(*) AS n_rows "
            "FROM s__tsev GROUP BY grp"
        )
    assert view() == direct()  # definition survived


def test_distinct_materialized_view_lifecycle(spark, wh):
    """count(DISTINCT col) MV: exact distinct counts maintained under
    DML through the two-level child composition; the child table and
    the source watermark it pins retire with the view (DROP and
    name-reuse both)."""
    src = wh.relation("s", "dvsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i % 7) for i in range(30)], "id long, grp long, v long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__dv AS "
        "SELECT grp, count(DISTINCT v) AS nd FROM s__dvsrc GROUP BY grp"
    )
    mv = wh.relation("s", "dv")
    child = wh.relation("s", "dv__elems")
    assert wh.exists(child)
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(src)
        .groupBy("grp")
        .agg(F.count_distinct("v").alias("nd"))
        .collect()
    )
    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "nd").collect()
    )
    assert view() == direct()

    # one-of-many delete holds the count; last-of-value drops it;
    # an update introduces a new value
    wh.sql("DELETE FROM s__dvsrc WHERE id = 0")
    wh.sql("DELETE FROM s__dvsrc WHERE v = 5")
    wh.sql("UPDATE s__dvsrc SET v = 42 WHERE id = 4")
    out = wh.sql("REFRESH MATERIALIZED VIEW s__dv").first()
    assert out["operation"] == "refresh_materialized_view"
    assert view() == direct()
    assert wh.sql("REFRESH MATERIALIZED VIEW s__dv").first()["n_rows"] == 0

    # two distinct outputs (or distinct mixed with min/max) still
    # raise, pre-shed — sum/count/avg mix via the agg_distinct form
    with pytest.raises(ValueError, match="at most ONE"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__dv AS "
            "SELECT grp, count(DISTINCT v) AS nd, count(DISTINCT id) AS ni "
            "FROM s__dvsrc GROUP BY grp"
        )
    assert view() == direct()  # survived

    # DROP retires the child and the source's child-named watermark
    child_tid = child.table_id
    assert any(
        (s.get("note") or "").startswith(f"aggview:{child_tid}")
        for s in wh.list_snapshots(src)
    )
    wh.sql("DROP TABLE s__dv")
    assert not wh.exists(child)
    assert not any(
        (s.get("note") or "").startswith(f"aggview:{child_tid}")
        for s in wh.list_snapshots(src)
    )
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__dv")


def test_or_replace_distinct_mview_elems_collision_preserves_view(spark, wh):
    """The `<view>__elems` collision check runs BEFORE shedding: a
    CREATE OR REPLACE ... count(DISTINCT) over an existing view must
    raise on an unrelated table occupying the child name WITHOUT
    destroying the view, its definition, or its watermarks (ADVICE
    r11 — every other validation in the create path honors this)."""
    src = wh.relation("s", "ocsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i % 5) for i in range(20)], "id long, grp long, v long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__ocv AS SELECT grp, sum(v) AS t, "
        "count(*) AS n FROM s__ocsrc GROUP BY grp"
    )
    # an UNRELATED table squats on the child name the distinct form needs
    squatter = wh.relation("s", "ocv__elems")
    wh.create_as(
        squatter, spark.createDataFrame([(1,)], "x long"), TableMeta()
    )
    with pytest.raises(ValueError, match="__elems exists"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__ocv AS "
            "SELECT grp, count(DISTINCT v) AS nd FROM s__ocsrc GROUP BY grp"
        )
    # the original view survived intact AND still refreshes (definition
    # + watermarks were not shed)
    mv = wh.relation("s", "ocv")
    assert wh.exists(mv)
    wh.sql("DELETE FROM s__ocsrc WHERE v = 2")
    wh.sql("REFRESH MATERIALIZED VIEW s__ocv")
    direct = wh.read(src).groupBy("grp").agg(
        F.sum("v").alias("t"), F.count(F.lit(1)).cast("long").alias("n")
    )
    assert sorted(map(tuple, wh.read(mv).select("grp", "t", "n").collect())) == sorted(
        map(tuple, direct.collect())
    )
    # a PRIOR distinct view that owns the child still replaces cleanly
    wh.sql("DROP TABLE s__ocv")
    wh.drop(squatter)
    wh.sql(
        "CREATE MATERIALIZED VIEW s__ocv AS "
        "SELECT grp, count(DISTINCT v) AS nd FROM s__ocsrc GROUP BY grp"
    )
    wh.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW s__ocv AS "
        "SELECT grp, count(DISTINCT v) AS nd2 FROM s__ocsrc GROUP BY grp"
    )
    assert "nd2" in wh.read(mv).columns


def test_extrema_materialized_view_lifecycle(spark, wh):
    """min/max outputs dispatch the MV to the extrema operator
    (touched-group recompute): maintained under DML via REFRESH,
    min/max cannot mix with the sum family (pre-shed raise), and DROP
    sheds the definition plus the extview watermark."""
    src = wh.relation("s", "exsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, (7 * i) % 50) for i in range(40)],
            "id long, grp long, v long",
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__exv AS SELECT grp, min(v) AS lo, "
        "max(v) AS hi FROM s__exsrc GROUP BY grp"
    )
    mv = wh.relation("s", "exv")
    direct = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(src)
        .groupBy("grp")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "lo", "hi").collect()
    )
    assert view() == direct()

    # kill a current max, bump a new min in, delete a whole group's rows
    wh.sql("DELETE FROM s__exsrc WHERE v >= 45")
    wh.sql("UPDATE s__exsrc SET v = v + 100 WHERE id % 5 = 0")
    wh.sql("DELETE FROM s__exsrc WHERE grp = 2")
    out = wh.sql("REFRESH MATERIALIZED VIEW s__exv").first()
    assert out["operation"] == "refresh_materialized_view"
    assert view() == direct()
    assert wh.read(mv).where("grp = 2").count() == 0  # group retracted
    assert wh.sql("REFRESH MATERIALIZED VIEW s__exv").first()["n_rows"] == 0

    # mixing extrema with the sum family raises BEFORE shedding
    with pytest.raises(ValueError, match="cannot mix"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__exv AS "
            "SELECT grp, min(v) AS lo, count(*) AS n FROM s__exsrc GROUP BY grp"
        )
    assert view() == direct()  # survived

    wh.sql("DROP TABLE s__exv")
    assert not any(
        (s.get("note") or "").startswith(f"extview:{mv.table_id}")
        for s in wh.list_snapshots(src)
    )
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__exv")


def test_avg_materialized_view_bit_identical(spark, wh):
    """avg(col) AS m is a derived MV output: the view maintains the
    hidden exact sum + count(*) and stores the served division — after
    a DML window + REFRESH the avg column equals the direct
    exact-sum/count quotient bit-identically."""
    src = wh.relation("s", "avsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 4, 3 * i + 1) for i in range(36)],
            "id long, grp long, v long",
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__avv AS SELECT grp, count(*) AS n, "
        "avg(v) AS m FROM s__avsrc GROUP BY grp"
    )
    mv = wh.relation("s", "avv")
    assert wh.read(mv).columns == ["grp", "n", "m", "_m__sum"]

    def direct():
        return sorted(
            tuple(x)
            for x in wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                (F.sum("v").cast("double") / F.count(F.lit(1))).alias("m"),
            )
            .collect()
        )

    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "n", "m").collect()
    )
    assert view() == direct()
    wh.sql("DELETE FROM s__avsrc WHERE id % 5 = 2")
    wh.sql("UPDATE s__avsrc SET v = v + 10 WHERE grp = 1")
    wh.sql("REFRESH MATERIALIZED VIEW s__avv")
    assert view() == direct()


def test_join_agg_materialized_view_lifecycle(spark, wh):
    """The composed join-aggregate MV (UNIQUE KEYS + GROUP BY): one
    statement materializes SELECT k, sum, count, avg FROM l JOIN r
    USING (j) [WHERE pred] GROUP BY k as a maintained view; REFRESH
    syncs DML from BOTH base tables through the hidden __join child;
    DROP retires the child and both sides' watermarks."""
    l = wh.relation("s", "jfact")
    r = wh.relation("s", "jdim")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 5, 3 * i) for i in range(40)], "fid long, j long, amt long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(j, j % 2) for j in range(5)], "j long, grp long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__jav UNIQUE KEYS (fid, j) AS "
        "SELECT grp, sum(amt) AS total, count(*) AS n, avg(amt) AS m "
        "FROM s__jfact JOIN s__jdim USING (j) "
        "WHERE amt >= 0 GROUP BY grp"
    )
    mv = wh.relation("s", "jav")
    child = wh.relation("s", "jav__join")
    assert wh.exists(child)
    assert wh.read(mv).columns == ["grp", "total", "n", "m", "_m__sum"]

    def direct():
        return sorted(
            tuple(x)
            for x in wh.read(l)
            .join(wh.read(r), "j")
            .where("amt >= 0")
            .groupBy("grp")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"),
                (F.sum("amt").cast("double") / F.count(F.lit(1))).alias("m"),
            )
            .collect()
        )

    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "total", "n", "m").collect()
    )
    assert view() == direct()

    # DML on both sides, one REFRESH
    wh.sql("DELETE FROM s__jfact WHERE fid % 7 = 2")
    wh.sql("UPDATE s__jfact SET amt = amt + 5 WHERE fid % 3 = 0")
    wh.sql("UPDATE s__jdim SET grp = 7 WHERE j = 1")
    wh.sql("DELETE FROM s__jdim WHERE j = 4")
    out = wh.sql("REFRESH MATERIALIZED VIEW s__jav").first()
    assert out["operation"] == "refresh_materialized_view"
    assert view() == direct()
    assert wh.sql("REFRESH MATERIALIZED VIEW s__jav").first()["n_rows"] == 0

    # min/max mixed with sum/count in the join-agg form raises pre-shed
    # (pure extrema and count(DISTINCT) forms are their OWN l2 kinds)
    with pytest.raises(ValueError, match="cannot mix"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__jav UNIQUE KEYS (fid, j) "
            "AS SELECT grp, min(amt) AS lo, count(*) AS n "
            "FROM s__jfact JOIN s__jdim USING (j) GROUP BY grp"
        )
    assert view() == direct()  # survived

    # DROP sheds the child table and BOTH sides' joinview watermarks
    child_tid = child.table_id
    for side in (l, r):
        assert any(
            (s.get("note") or "").startswith(f"joinview:{child_tid}:")
            for s in wh.list_snapshots(side)
        )
    wh.sql("DROP TABLE s__jav")
    assert not wh.exists(child)
    for side in (l, r):
        assert not any(
            (s.get("note") or "").startswith(f"joinview:{child_tid}:")
            for s in wh.list_snapshots(side)
        )
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__jav")


def test_mixed_agg_distinct_materialized_view_lifecycle(spark, wh):
    """SELECT k, count(*), sum(x), count(DISTINCT u) in ONE MV (the
    most common rollup shape): creates the composed agg_distinct view,
    REFRESH syncs DML (quiet refresh reports 0), and DROP/name-reuse
    sheds all three child tables and both source watermarks."""
    src = wh.relation("s", "mxsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, 2 * i, i % 5) for i in range(30)],
            "id long, grp long, amt long, u long",
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__mx AS SELECT grp, count(*) AS n, "
        "sum(amt) AS total, count(DISTINCT u) AS nu "
        "FROM s__mxsrc GROUP BY grp"
    )
    mv = wh.relation("s", "mx")
    child_a = wh.relation("s", "mx__agg")
    child_d = wh.relation("s", "mx__dcnt")
    elems = wh.relation("s", "mx__dcnt__elems")
    for c in (child_a, child_d, elems):
        assert wh.exists(c)
    assert wh.read(mv).columns == ["grp", "n", "total", "nu"]

    def direct():
        return sorted(
            tuple(x)
            for x in wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("amt").alias("total"),
                F.count_distinct("u").alias("nu"),
            )
            .collect()
        )

    view = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "n", "total", "nu").collect()
    )
    assert view() == direct()

    wh.sql("DELETE FROM s__mxsrc WHERE id % 5 = 1")
    wh.sql("UPDATE s__mxsrc SET u = 77 WHERE id % 4 = 0")
    wh.sql("UPDATE s__mxsrc SET amt = amt + 3 WHERE grp = 1")
    out = wh.sql("REFRESH MATERIALIZED VIEW s__mx").first()
    assert out["operation"] == "refresh_materialized_view" and out["n_rows"] > 0
    assert view() == direct()
    assert wh.sql("REFRESH MATERIALIZED VIEW s__mx").first()["n_rows"] == 0

    # name-reuse over a squatted child raises pre-shed; owned children
    # replace cleanly
    squat = wh.relation("s", "mx2__agg")
    wh.create_as(squat, spark.createDataFrame([(1,)], "x long"), TableMeta())
    with pytest.raises(ValueError, match="__agg exists"):
        wh.sql(
            "CREATE MATERIALIZED VIEW s__mx2 AS SELECT grp, count(*) AS n, "
            "count(DISTINCT u) AS nu FROM s__mxsrc GROUP BY grp"
        )
    wh.drop(squat)
    wh.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW s__mx AS SELECT grp, "
        "count(*) AS n2, count(DISTINCT amt) AS na FROM s__mxsrc GROUP BY grp"
    )
    assert wh.read(mv).columns == ["grp", "n2", "na"]

    # DROP retires children + the source's child-named watermarks
    wh.sql("DROP TABLE s__mx")
    for c in (child_a, child_d, elems):
        assert not wh.exists(c)
    assert not any(
        "mx__" in (s.get("note") or "") for s in wh.list_snapshots(src)
    )
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__mx")


def test_multiway_join_agg_materialized_view_lifecycle(spark, wh):
    """The 3-table star join-aggregate MV: UNIQUE KEYS (fid, d1, d2)
    with two JOIN ... USING segments nests TWO hidden join children
    (__join, __join2); REFRESH syncs DML from ALL THREE bases —
    including a dim-key MOVE deep in the chain — and DROP sheds the
    whole stack."""
    f = wh.relation("s", "m3fact")
    d1 = wh.relation("s", "m3d1")
    d2 = wh.relation("s", "m3d2")
    wh.create_as(
        f,
        spark.createDataFrame(
            [(i, i % 5, i % 3, 2 * i) for i in range(40)],
            "fid long, j1 long, j2 long, amt long",
        ),
        TableMeta(),
    )
    wh.create_as(
        d1,
        spark.createDataFrame(
            [(j, j % 2) for j in range(5)], "j1 long, reg long"
        ),
        TableMeta(),
    )
    wh.create_as(
        d2,
        spark.createDataFrame(
            [(j, 10 + j) for j in range(3)], "j2 long, seg long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__m3v UNIQUE KEYS (fid, j1, j2) AS "
        "SELECT reg, seg, sum(amt) AS total, count(*) AS n "
        "FROM s__m3fact JOIN s__m3d1 USING (j1) JOIN s__m3d2 USING (j2) "
        "GROUP BY reg, seg"
    )
    mv = wh.relation("s", "m3v")
    c1 = wh.relation("s", "m3v__join")
    c2 = wh.relation("s", "m3v__join2")
    assert wh.exists(c1) and wh.exists(c2)

    def direct():
        return sorted(
            tuple(x)
            for x in wh.read(f)
            .join(wh.read(d1), "j1")
            .join(wh.read(d2), "j2")
            .groupBy("reg", "seg")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .collect()
        )

    view = lambda: sorted(  # noqa: E731
        tuple(x)
        for x in wh.read(mv).select("reg", "seg", "total", "n").collect()
    )
    assert view() == direct()

    # DML on all three bases, incl. a key move on the DEEP dim: the
    # fan-out must retract from the old (reg, seg) and land in the new
    wh.sql("DELETE FROM s__m3fact WHERE fid % 7 = 3")
    wh.sql("UPDATE s__m3fact SET amt = amt + 1 WHERE fid % 4 = 0")
    wh.sql("UPDATE s__m3d1 SET reg = 9 WHERE j1 = 2")
    wh.sql("UPDATE s__m3d2 SET seg = 77 WHERE j2 = 1")
    wh.sql("DELETE FROM s__m3d2 WHERE j2 = 0")
    wh.sql("REFRESH MATERIALIZED VIEW s__m3v")
    assert view() == direct()
    assert wh.sql("REFRESH MATERIALIZED VIEW s__m3v").first()["n_rows"] == 0

    # DROP sheds both chain children and every base's watermarks
    c1_tid, c2_tid = c1.table_id, c2.table_id
    wh.sql("DROP TABLE s__m3v")
    assert not wh.exists(c1) and not wh.exists(c2)
    for side, tid in ((f, c1_tid), (d1, c1_tid), (d2, c2_tid)):
        assert not any(
            (s.get("note") or "").startswith(f"joinview:{tid}:")
            for s in wh.list_snapshots(side)
        )


def test_join_distinct_materialized_view_lifecycle(spark, wh):
    """count(DISTINCT u) over a join — alone (distinct l2) and next to
    sum/count (agg_distinct l2) — through base DML on both sides."""
    l = wh.relation("s", "jdfact")
    r = wh.relation("s", "jddim")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 4, i % 7, i) for i in range(40)],
            "fid long, j long, u long, amt long",
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(j, j % 2) for j in range(4)], "j long, grp long"),
        TableMeta(),
    )
    # distinct-only over the join
    wh.sql(
        "CREATE MATERIALIZED VIEW s__jdv UNIQUE KEYS (fid, j) AS "
        "SELECT grp, count(DISTINCT u) AS nu "
        "FROM s__jdfact JOIN s__jddim USING (j) GROUP BY grp"
    )
    mv = wh.relation("s", "jdv")

    def direct_d():
        return sorted(
            tuple(x)
            for x in wh.read(l)
            .join(wh.read(r), "j")
            .groupBy("grp")
            .agg(F.count_distinct("u").alias("nu"))
            .collect()
        )

    assert sorted(tuple(x) for x in wh.read(mv).collect()) == direct_d()
    wh.sql("UPDATE s__jdfact SET u = 99 WHERE fid % 5 = 0")
    wh.sql("UPDATE s__jddim SET grp = 3 WHERE j = 1")
    wh.sql("DELETE FROM s__jdfact WHERE fid % 9 = 2")
    wh.sql("REFRESH MATERIALIZED VIEW s__jdv")
    assert sorted(tuple(x) for x in wh.read(mv).collect()) == direct_d()

    # mixed: count(*), sum, count(DISTINCT) over the join
    wh.sql(
        "CREATE MATERIALIZED VIEW s__jmv UNIQUE KEYS (fid, j) AS "
        "SELECT grp, count(*) AS n, sum(amt) AS total, "
        "count(DISTINCT u) AS nu "
        "FROM s__jdfact JOIN s__jddim USING (j) GROUP BY grp"
    )
    mv2 = wh.relation("s", "jmv")

    def direct_m():
        return sorted(
            tuple(x)
            for x in wh.read(l)
            .join(wh.read(r), "j")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("amt").alias("total"),
                F.count_distinct("u").alias("nu"),
            )
            .collect()
        )

    got2 = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv2).select("grp", "n", "total", "nu").collect()
    )
    assert got2() == direct_m()
    wh.sql("DELETE FROM s__jddim WHERE j = 0")
    wh.sql("UPDATE s__jdfact SET amt = amt + 3 WHERE fid % 2 = 1")
    wh.sql("REFRESH MATERIALIZED VIEW s__jmv")
    assert got2() == direct_m()

    # DROP sheds every hidden child of both stacks
    wh.sql("DROP TABLE s__jdv")
    wh.sql("DROP TABLE s__jmv")
    for name in (
        "jdv__join", "jdv__elems", "jmv__join", "jmv__agg", "jmv__dcnt",
        "jmv__dcnt__elems",
    ):
        assert not wh.exists(wh.relation("s", name)), name


def test_left_join_materialized_view_lifecycle(spark, wh):
    """LEFT JOIN MV (kind left_join): null-extended rows retract when a
    match arrives and re-land when the last match dies, via plain
    REFRESH."""
    l = wh.relation("s", "ljfact")
    r = wh.relation("s", "ljdim")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 4, i) for i in range(16)], "fid long, k long, lv long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(100, 0, 5), (101, 1, 6)], "rid long, k long, rv long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__ljv UNIQUE KEYS (fid, rid) AS "
        "SELECT * FROM s__ljfact LEFT JOIN s__ljdim USING (k)"
    )
    mv = wh.relation("s", "ljv")

    def direct():
        return sorted(
            (tuple(x) for x in wh.read(l).join(wh.read(r), "k", "left").collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    got = lambda: sorted(  # noqa: E731
        (
            tuple(x)
            for x in wh.read(mv)
            .select(*wh.read(l).join(wh.read(r), "k", "left").columns)
            .collect()
        ),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got() == direct()
    assert wh.read(mv).where("rv IS NULL").count() == 8  # k in 2..3

    # late-arriving dim + a dying match
    wh.sql("INSERT INTO s__ljdim VALUES (102, 2, 7)")
    wh.sql("DELETE FROM s__ljdim WHERE rid = 101")
    wh.sql("REFRESH MATERIALIZED VIEW s__ljv")
    assert got() == direct()
    assert wh.read(mv).where("k = 2 AND rv IS NULL").count() == 0
    assert wh.read(mv).where("k = 1 AND rv IS NULL").count() == 4

    wh.sql("DROP TABLE s__ljv")
    with pytest.raises(ValueError, match="not a materialized view"):
        wh.sql("REFRESH MATERIALIZED VIEW s__ljv")


def test_expression_measure_materialized_views(spark, wh):
    """sum(<expr>) AS out — the revenue-measure shape — in the agg form
    AND the join-agg form, with quantize(expr, d) admitting a
    float-typed expression; maintained exactly through DML windows."""
    src = wh.relation("s", "exsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i % 50, (i * 7) % 30) for i in range(40)],
            "id long, grp long, price long, disc long",
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__exv AS SELECT grp, "
        "sum(price * (100 - disc)) AS rev, count(*) AS n, "
        "avg(quantize(price * (1d - disc / 100d), 6)) AS m "
        "FROM s__exsrc GROUP BY grp"
    )
    mv = wh.relation("s", "exv")

    def direct():
        e = F.expr("price * (100 - disc)")
        q = F.round(F.expr("price * (1d - disc / 100d)") * F.lit(1e6)).cast(
            "long"
        )
        return sorted(
            tuple(x)
            for x in wh.read(src)
            .groupBy("grp")
            .agg(
                F.sum(e).alias("rev"),
                F.count(F.lit(1)).cast("long").alias("n"),
                (
                    F.sum(q).cast("double") / F.lit(1e6) / F.count(F.lit(1))
                ).alias("m"),
            )
            .collect()
        )

    got = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "rev", "n", "m").collect()
    )
    assert got() == direct()
    wh.sql("UPDATE s__exsrc SET disc = disc + 5 WHERE id % 4 = 1")
    wh.sql("DELETE FROM s__exsrc WHERE id % 5 = 0")
    wh.sql("REFRESH MATERIALIZED VIEW s__exv")
    assert got() == direct()

    # a float-typed expression WITHOUT quantize raises pre-shed
    with pytest.raises(ValueError, match="floating-point"):
        wh.sql(
            "CREATE MATERIALIZED VIEW s__exbad AS SELECT grp, "
            "sum(price * (1d - disc / 100d)) AS rev, count(*) AS n "
            "FROM s__exsrc GROUP BY grp"
        )

    # the join-agg form takes the same expression measures
    dim = wh.relation("s", "exdim")
    wh.create_as(
        dim,
        spark.createDataFrame([(g, g % 2) for g in range(3)], "grp long, reg long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__exjv UNIQUE KEYS (id, grp) AS "
        "SELECT reg, sum(price * (100 - disc)) AS rev, count(*) AS n "
        "FROM s__exsrc JOIN s__exdim USING (grp) GROUP BY reg"
    )
    mvj = wh.relation("s", "exjv")

    def direct_j():
        return sorted(
            tuple(x)
            for x in wh.read(src)
            .join(wh.read(dim), "grp")
            .groupBy("reg")
            .agg(
                F.sum(F.expr("price * (100 - disc)")).alias("rev"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .collect()
        )

    gotj = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mvj).select("reg", "rev", "n").collect()
    )
    assert gotj() == direct_j()
    wh.sql("UPDATE s__exdim SET reg = 5 WHERE grp = 1")
    wh.sql("UPDATE s__exsrc SET price = price + 2 WHERE id % 3 = 0")
    wh.sql("REFRESH MATERIALIZED VIEW s__exjv")
    assert gotj() == direct_j()


def test_having_materialized_view_lifecycle(spark, wh):
    """GROUP BY ... HAVING on the agg MV: the full state lives in the
    hidden __state child, the target is the maintained σ over it, and
    groups crossing the HAVING boundary in BOTH directions enter/leave
    the target through plain REFRESH."""
    src = wh.relation("s", "hvsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 4, 1) for i in range(20)] + [(100, 9, 1)],
            "id long, grp long, v long",
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__hv AS SELECT grp, count(*) AS n, "
        "sum(v) AS t FROM s__hvsrc GROUP BY grp HAVING n > 3"
    )
    mv = wh.relation("s", "hv")
    child = wh.relation("s", "hv__state")
    assert wh.exists(child)

    def direct():
        return sorted(
            tuple(x)
            for x in wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v").alias("t"),
            )
            .where("n > 3")
            .collect()
        )

    got = lambda: sorted(  # noqa: E731
        tuple(x) for x in wh.read(mv).select("grp", "n", "t").collect()
    )
    assert got() == direct()
    assert wh.read(mv).where("grp = 9").count() == 0  # n=1, filtered

    # grp 9 crosses INTO the filter; grp 0 falls OUT (delete to n<=3)
    wh.sql("INSERT INTO s__hvsrc VALUES (101, 9, 1), (102, 9, 1), (103, 9, 1)")
    wh.sql("DELETE FROM s__hvsrc WHERE grp = 0 AND id > 3")
    wh.sql("REFRESH MATERIALIZED VIEW s__hv")
    assert got() == direct()
    assert wh.read(mv).where("grp = 9").count() == 1
    assert wh.read(mv).where("grp = 0").count() == 0
    # the full state child still carries the filtered-out group exactly
    assert wh.read(child).where("grp = 0").first()["n"] > 0

    # quiet refresh, then back across the boundary
    assert wh.sql("REFRESH MATERIALIZED VIEW s__hv").first()["n_rows"] == 0
    wh.sql("INSERT INTO s__hvsrc VALUES (200, 0, 1), (201, 0, 1), (202, 0, 1)")
    wh.sql("REFRESH MATERIALIZED VIEW s__hv")
    assert got() == direct()
    assert wh.read(mv).where("grp = 0").count() == 1

    # HAVING on distinct/extrema kinds raises honestly, pre-shed
    with pytest.raises(ValueError, match="HAVING is supported"):
        wh.sql(
            "CREATE OR REPLACE MATERIALIZED VIEW s__hv AS SELECT grp, "
            "count(DISTINCT v) AS nd FROM s__hvsrc GROUP BY grp HAVING nd > 1"
        )
    assert got() == direct()  # survived

    # DROP sheds the state child and the source watermark
    child_tid = child.table_id
    wh.sql("DROP TABLE s__hv")
    assert not wh.exists(child)
    assert not any(
        (s.get("note") or "").startswith(f"aggview:{child_tid}")
        for s in wh.list_snapshots(src)
    )
