"""SQL DML statements over warehouse tables.

The reference's user surface is SQL-first (the merge/delete templates in
/root/reference/macros/materialization/incremental_partition_merge.sql:248-265
compile to BigQuery DML); this module gives ``Warehouse.sql`` the same
statement surface by PARSING a constrained, documented DML grammar and
dispatching to the existing merge-on-read operators — the SQL form and
the DataFrame form of every statement run the identical plan:

- ``DELETE FROM <table> [WHERE <row-local predicate>]``
  -> :meth:`Warehouse.delete_where`
- ``UPDATE <table> SET col = expr [, ...] [WHERE <predicate>]``
  -> :meth:`Warehouse.update_where`
- ``INSERT INTO <table> [(cols)] SELECT ...|VALUES (...), ...``
  -> :meth:`Warehouse.append` (column-aligned; a derived DAY partition
  column is computed from the table's ``partition_source`` exactly like
  the merge staging step)
- ``INSERT OVERWRITE [TABLE] <table> ...`` -> dynamic partition
  overwrite (partitioned: replaces exactly the batch's partitions) or
  a sidecar-preserving whole-table replace (unpartitioned)
- ``MERGE INTO <t> USING <src|(subquery)> ON t.k = s.k [AND ...]``
  ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
  -> keyed upsert: :meth:`Warehouse.delete_matching` on the ON keys
  then a single aligned append — the same merge-on-read apply
  ``run_replica_sync`` uses, so a SQL MERGE costs O(delta + key
  probe), never a table rewrite. Only the ``UPDATE SET * / INSERT *``
  whole-row form is accepted (the Delta/Iceberg upsert idiom); richer
  WHEN clauses raise with a pointer to the DataFrame API.

- ``CREATE [OR REPLACE] MATERIALIZED VIEW <t> UNIQUE KEYS (lid, rid)
  AS SELECT * FROM <l> [INNER|LEFT [OUTER]] JOIN <r> USING (k, ...)``
  -> a full :func:`run_incremental_join_view` (or, for LEFT,
  :func:`run_incremental_left_join_view` — null-extended rows retract
  when a match arrives and re-land when the last match dies)
  materialize with the definition persisted per schema; ``REFRESH
  MATERIALIZED VIEW <t>`` -> one delta sync off both sources'
  changelog windows (join-view IVM — the SQL face of the maintained
  join). Each side may be a row-local derived table ``(SELECT cols
  FROM t [WHERE pred])`` — projection + filter maintained
  incrementally (σ(π(L)) ⋈ σ(π(R))); the projection must keep that
  side's UNIQUE KEY and the USING columns. With a GROUP BY on top it
  is the composed join-aggregate form: ``UNIQUE KEYS (id1, id2[,
  id3...]) AS SELECT k, sum(x) AS sx, count(*) AS n [,
  count(DISTINCT u) AS du | min/max(col) AS m] FROM a JOIN b USING
  (c) [JOIN c USING (d) ...] [WHERE pred] GROUP BY k`` — one hidden
  join child per JOIN step (composite identities), the level-2 view
  picked by the SELECT list (agg / distinct / mixed / extrema).
- ``CREATE [OR REPLACE] MATERIALIZED VIEW <t> AS SELECT k1, ...,
  sum(x) AS sx, count(*) AS n FROM <src> [WHERE pred] GROUP BY
  k1, ...`` -> a full :func:`run_incremental_agg_view` materialize
  (aggregate-view IVM: inserts add, deletes subtract, groups retract
  to zero; the row-local WHERE filters both changelog feeds
  symmetrically). A ``time_bucket(ts, bucket_us) AS b`` SELECT item
  (named in GROUP BY) makes it the changelog-driven CONTINUOUS
  aggregate — the exact-integer bucket is a derived group key, so
  deletes retract from and ts-moving updates re-land in the right
  bucket. The same ``REFRESH`` statement then syncs one changelog
  window. A lone ``count(DISTINCT col) AS name`` output instead
  dispatches to :func:`run_incremental_distinct_view` — exact distinct
  counts via the two-level composition (a ``<t>__elems`` child table
  carries the (group, value) multiplicities; its lifecycle rides the
  view's). ``sum|avg(<row-local expr>) AS name`` items are EXPRESSION
  measures (wrap a float-typed expression in ``quantize(expr, d)``);
  ``GROUP BY k HAVING pred`` dispatches the agg form to
  :func:`run_incremental_agg_having_view` (full state in a hidden
  ``<t>__state`` child, the target is the maintained σ over it). The
  MV kinds share the registry — the definition's ``kind`` picks the
  refresh path.
- ``CREATE [OR REPLACE] TABLE <schema>__<t> [PARTITIONED BY (col)]
  AS <select>`` -> :meth:`Warehouse.create_as`;
  ``DROP TABLE [IF EXISTS] <t>`` -> :meth:`Warehouse.drop` — the DDL
  pair the reference's CTAS materializations compile to.

Each statement returns a ONE-ROW DataFrame
``(operation string, table string, n_rows long)`` where ``n_rows`` is
the statement's affected-row count (deleted / updated / inserted /
upserted), so SQL callers get their engine-style DML summary.

Honest limits (raise, never silently mis-execute): predicates must be
row-local (no subqueries — a key-set delete is ``delete_matching`` /
``MERGE``), one statement per call, target tables must resolve through
the caller's alias map.
"""

from __future__ import annotations

import json
import os
import re
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F

if TYPE_CHECKING:  # pragma: no cover
    from .warehouse import Relation, Warehouse

# Routes ONLY the statement forms this module implements: DELETE /
# UPDATE / INSERT / MERGE (genuinely DML-shaped — vanilla Spark SQL has
# no executable form for them over these tables, so an unparseable one
# must raise here), plus exactly CREATE [OR REPLACE] TABLE and DROP
# TABLE. Every other CREATE/DROP head (CREATE [TEMP] VIEW, CREATE
# FUNCTION, DROP VIEW, ...) falls through to the spark.sql pass-through
# in Warehouse.sql — routing them here regressed previously-working
# callers with a 'cannot parse' raise (ADVICE r9 #4).
DML_HEAD_RE = re.compile(
    r"^\s*(?:(delete|update|insert|merge)\b"
    r"|(create)\s+(?:or\s+replace\s+)?(?:table|materialized\s+view)\b"
    r"|(drop)\s+table\b"
    r"|(refresh)\s+materialized\s+view\b)",
    re.I,
)

_SUBQUERY_RE = re.compile(r"\(\s*select\b", re.I)


def _split_top(s: str, sep: str) -> list[str]:
    """Split ``s`` on single-char ``sep`` at paren depth 0, outside
    '...'/"..."/`...` quoting (doubled closing quotes read as
    close-then-reopen, which still splits correctly)."""
    out: list[str] = []
    buf: list[str] = []
    depth, q = 0, None
    for ch in s:
        if q is not None:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"`":
            q = ch
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


def _top_kw_split(s: str, kw: str) -> tuple[str, str | None]:
    """Split ``s`` at the FIRST top-level occurrence of word ``kw``
    (case-insensitive, not inside parens/quotes): (before, after) or
    (s, None)."""
    depth, q, i, n = 0, None, 0, len(s)
    kl = len(kw)
    while i < n:
        ch = s[i]
        if q is not None:
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"`":
            q = ch
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i : i + kl].lower() == kw.lower()
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + kl == n or not (s[i + kl].isalnum() or s[i + kl] == "_"))
        ):
            return s[:i], s[i + kl :]
        i += 1
    return s, None


def _resolve(tables: dict[str, "Relation"], name: str) -> "Relation":
    if name not in tables:
        raise ValueError(
            f"SQL DML: unknown table alias {name!r}; registered: "
            f"{sorted(tables)}"
        )
    return tables[name]


def _reject_subquery(clause: str, stmt: str) -> None:
    if _SUBQUERY_RE.search(clause):
        raise ValueError(
            f"SQL {stmt}: subqueries in predicates are not supported — "
            "predicates must be row-local; express a key-set "
            "delete/upsert as MERGE or Warehouse.delete_matching"
        )


def _align_for_append(wh: "Warehouse", rel: "Relation", df: DataFrame) -> DataFrame:
    """Column-align ``df`` to the target's stored layout, deriving the
    internal DAY partition column from ``partition_source`` when absent
    (the same staging rule run_incremental_partition_merge applies)."""
    meta = wh.read_meta(rel)
    tgt_schema = wh.read(rel).schema
    tgt = tgt_schema.names
    if (
        meta.partition_by
        and meta.partition_by not in df.columns
        and meta.partition_source
        and meta.partition_source in df.columns
    ):
        df = df.withColumn(
            meta.partition_by, F.to_date(F.col(meta.partition_source))
        )
    missing = [c for c in tgt if c not in df.columns]
    extra = [c for c in df.columns if c not in tgt]
    if missing or extra:
        raise ValueError(
            f"SQL DML: source columns do not align with {rel.table_id}: "
            f"missing={missing} extra={extra}"
        )
    # cast to the target's DECLARED types (ANSI INSERT semantics; an
    # invalid cast throws): a narrower source literal (int into bigint)
    # would otherwise land files with a divergent physical type that
    # breaks every later vectorized read
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in tgt_schema.fields]
    )


def _stats(wh: "Warehouse", op: str, rel: "Relation", n: int) -> DataFrame:
    return wh.spark.createDataFrame(
        [(op, rel.table_id, int(n))],
        "operation string, table string, n_rows long",
    )


def _run_source_sql(
    wh: "Warehouse", tables: dict[str, "Relation"], source_sql: str
) -> DataFrame:
    """Evaluate a SELECT/VALUES source with the alias map registered as
    temp views (same storage-semantics binding as Warehouse.sql reads)."""
    for alias, rel in tables.items():
        wh.read(rel).createOrReplaceTempView(alias)
    try:
        return wh.spark.sql(source_sql)
    finally:
        for alias in tables:
            wh.spark.catalog.dropTempView(alias)


def _parse_assignments(set_clause: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in _split_top(set_clause, ","):
        m = re.match(r"^\s*`?(\w+)`?\s*=\s*(\S.*?)\s*$", part, re.S)
        if not m:
            raise ValueError(f"SQL UPDATE: cannot parse assignment {part!r}")
        col, expr = m.group(1), m.group(2)
        if col in out:
            raise ValueError(f"SQL UPDATE: column {col!r} assigned twice")
        out[col] = expr
    return out


def _delete(wh, tables, query: str) -> DataFrame:
    m = re.match(r"^\s*delete\s+from\s+`?([\w.]+)`?\s*(.*?)\s*;?\s*$", query, re.I | re.S)
    if not m:
        raise ValueError(f"SQL DELETE: cannot parse {query!r}")
    rel = _resolve(tables, m.group(1))
    rest = m.group(2).strip()
    if rest:
        wm = re.match(r"^where\b(.*)$", rest, re.I | re.S)
        if not wm:
            raise ValueError(f"SQL DELETE: unexpected clause {rest!r}")
        cond = wm.group(1).strip()
        _reject_subquery(cond, "DELETE")
    else:
        cond = "true"
    r = wh.delete_where(rel, cond)
    return _stats(wh, "delete", rel, r["n_deleted"])


def _update(wh, tables, query: str) -> DataFrame:
    m = re.match(r"^\s*update\s+`?([\w.]+)`?\s+set\b(.*)$", query, re.I | re.S)
    if not m:
        raise ValueError(f"SQL UPDATE: cannot parse {query!r}")
    rel = _resolve(tables, m.group(1))
    set_clause, where = _top_kw_split(m.group(2), "where")
    if where is None:
        where = "true"
    where = where.strip().rstrip(";").strip() or "true"
    _reject_subquery(where, "UPDATE")
    assigns = _parse_assignments(set_clause.strip().rstrip(";"))
    _reject_subquery(" ".join(assigns.values()), "UPDATE")
    r = wh.update_where(rel, where, assigns)
    return _stats(wh, "update", rel, r["n_updated"])


def _insert(wh, tables, query: str) -> DataFrame:
    m = re.match(
        r"^\s*insert\s+(into|overwrite)\s+(?:table\s+)?`?([\w.]+)`?\s*(\([^)]*\))?\s*"
        r"((?:select|values|with|table)\b.*?)\s*;?\s*$",
        query,
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"SQL INSERT: cannot parse {query!r}")
    overwrite = m.group(1).lower() == "overwrite"
    rel = _resolve(tables, m.group(2))
    col_list = (
        [c.strip().strip("`") for c in m.group(3)[1:-1].split(",")]
        if m.group(3)
        else None
    )
    src = _run_source_sql(wh, tables, m.group(4))
    if col_list is not None:
        if len(col_list) != len(src.columns):
            raise ValueError(
                f"SQL INSERT: {len(col_list)} target columns vs "
                f"{len(src.columns)} source columns"
            )
        src = src.toDF(*col_list)
    elif m.group(4).lstrip()[:6].lower() == "values":
        # bare VALUES yields col1..colN: map positionally onto the
        # table's USER columns (a partition_source-derived partition
        # column is computed, not supplied)
        meta = wh.read_meta(rel)
        tgt = [
            c
            for c in wh.read(rel).columns
            if not (c == meta.partition_by and meta.partition_source)
        ]
        if len(tgt) != len(src.columns):
            raise ValueError(
                f"SQL INSERT: VALUES arity {len(src.columns)} vs "
                f"{len(tgt)} columns of {rel.table_id}"
            )
        src = src.toDF(*tgt)
    src = _align_for_append(wh, rel, src).localCheckpoint(eager=True)
    n = src.count()
    if overwrite:
        # INSERT OVERWRITE: partitioned tables replace exactly the
        # partitions present in the batch (dynamic partition
        # overwrite); unpartitioned tables replace all rows (sidecars
        # preserved via the same stash apply_deletes uses)
        meta = wh.read_meta(rel)
        if meta.partition_by:
            if n:
                wh.overwrite_partitions(rel, src)
        else:
            wh._overwrite_preserving_sidecars(rel, meta, src)
        return _stats(wh, "insert_overwrite", rel, n)
    if n:
        wh.append(rel, src)
    return _stats(wh, "insert", rel, n)


_MERGE_TAIL_RE = re.compile(
    r"^\s*when\s+matched\s+then\s+update\s+set\s+\*\s+"
    r"when\s+not\s+matched\s+then\s+insert\s+\*\s*;?\s*$",
    re.I,
)


def _merge(wh, tables, query: str) -> DataFrame:
    m = re.match(
        r"^\s*merge\s+into\s+`?([\w.]+)`?(?:\s+(?:as\s+)?(\w+))?\s+using\s+(.*)$",
        query,
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"SQL MERGE: cannot parse {query!r}")
    rel = _resolve(tables, m.group(1))
    t_names = {m.group(1), m.group(2)} - {None}
    rest = m.group(3).lstrip()
    if rest.startswith("("):
        # balanced-paren scan for the USING subquery
        depth, q, i = 0, None, 0
        for i, ch in enumerate(rest):
            if q is not None:
                if ch == q:
                    q = None
                continue
            if ch in "'\"`":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        if depth != 0:
            raise ValueError("SQL MERGE: unbalanced parens in USING subquery")
        src_sql, rest = rest[1:i], rest[i + 1 :]
        src = _run_source_sql(wh, tables, src_sql)
        s_names = set()
    else:
        sm = re.match(r"^`?([\w.]+)`?(.*)$", rest, re.S)
        src_name = sm.group(1)
        rest = sm.group(2)
        src = wh.read(_resolve(tables, src_name))
        s_names = {src_name}
    am = re.match(r"^\s*(?:as\s+)?(\w+)\b(.*)$", rest, re.I | re.S)
    if am and am.group(1).lower() != "on":
        s_names.add(am.group(1))
        rest = am.group(2)
    om = re.match(r"^\s*on\b(.*)$", rest, re.I | re.S)
    if not om:
        raise ValueError(f"SQL MERGE: expected ON clause at {rest[:40]!r}")
    on_clause, tail = _top_kw_split(om.group(1), "when")
    if tail is None or not _MERGE_TAIL_RE.match("when" + tail):
        raise ValueError(
            "SQL MERGE: only 'WHEN MATCHED THEN UPDATE SET * WHEN NOT "
            "MATCHED THEN INSERT *' is supported — use "
            "run_incremental_partition_merge / delete_matching for "
            "richer clauses"
        )
    keys: list[str] = []
    for conj in re.split(r"\band\b", on_clause, flags=re.I):
        cm = re.match(
            r"^\s*`?(\w+)`?\.`?(\w+)`?\s*=\s*`?(\w+)`?\.`?(\w+)`?\s*$", conj
        )
        if not cm:
            raise ValueError(
                f"SQL MERGE: ON must be a conjunction of t.k = s.k "
                f"equalities, got {conj.strip()!r}"
            )
        q1, c1, q2, c2 = cm.groups()
        if c1 != c2:
            raise ValueError(
                f"SQL MERGE: ON key names must match on both sides "
                f"({c1!r} vs {c2!r})"
            )
        # EXACTLY one qualifier on the target, the other on the source:
        # a t.k = t.k typo (trivially true in real SQL) or an unknown
        # qualifier must never silently run as a keyed upsert
        is_t1, is_t2 = q1 in t_names, q2 in t_names
        if is_t1 == is_t2:
            raise ValueError(
                f"SQL MERGE: ON conjunct {conj.strip()!r} must compare a "
                f"target-qualified ({t_names}) column to a "
                f"source-qualified column, exactly one of each"
            )
        src_q = q2 if is_t1 else q1
        if s_names and src_q not in s_names:
            raise ValueError(
                f"SQL MERGE: qualifier {src_q!r} does not name the "
                f"source ({s_names})"
            )
        keys.append(c1)
    src = _align_for_append(wh, rel, src).localCheckpoint(eager=True)
    # real engines error on a source that matches one target row twice;
    # delete-then-append would silently keep both copies, so enforce
    if src.groupBy(*keys).count().where("count > 1").limit(1).count():
        raise ValueError(
            f"SQL MERGE: source is not unique on ON keys {keys} — "
            "pre-aggregate (e.g. QUALIFY ROW_NUMBER() = 1) first"
        )
    n_src = src.count()
    if n_src:
        # ONE atomic statement: the key masks and the inserted rows
        # commit together (a crash can never show deletes without
        # their replacements)
        wh.upsert_matching(rel, src, keys)
    return _stats(wh, "merge", rel, n_src)


def _rel_for_name(wh, tables, name: str):
    """Resolve a CREATE/DROP target: a registered alias, else the
    ``<schema>__<identifier>`` naming every default registration uses."""
    if name in tables:
        return tables[name]
    if "__" in name:
        schema, ident = name.split("__", 1)
        return wh.relation(schema, ident)
    raise ValueError(
        f"SQL DDL: cannot resolve {name!r} — use a registered alias or "
        "<schema>__<table>"
    )


def _create(wh, tables, query: str) -> DataFrame:
    if re.match(r"^\s*create\s+(?:or\s+replace\s+)?materialized\b", query, re.I):
        return _create_mview(wh, tables, query)
    m = re.match(
        r"^\s*create\s+(or\s+replace\s+)?table\s+`?([\w.]+)`?\s*"
        r"(?:partitioned\s+by\s*\(\s*`?(\w+)`?\s*\)\s*)?as\b(.*?)\s*;?\s*$",
        query,
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"SQL CREATE: cannot parse {query!r}")
    from .warehouse import TableMeta

    rel = _rel_for_name(wh, tables, m.group(2))
    if wh.exists(rel) and not m.group(1):
        raise ValueError(
            f"SQL CREATE: {rel.table_id} exists (use CREATE OR REPLACE)"
        )
    src = _run_source_sql(wh, tables, m.group(4).strip()).localCheckpoint(
        eager=True
    )
    pby = m.group(3)
    if pby and pby not in src.columns:
        raise ValueError(f"SQL CREATE: PARTITIONED BY column {pby!r} not in SELECT")
    # the name stops being a materialized view (if it ever was one):
    # shed the stale definition + pinned source watermarks, or a later
    # REFRESH would run the IVM delta path against this plain table
    _shed_mview(wh, rel)
    wh.create_as(rel, src, TableMeta(partition_by=pby))
    return _stats(wh, "create_table_as", rel, src.count())


def _drop(wh, tables, query: str) -> DataFrame:
    m = re.match(
        r"^\s*drop\s+table\s+(if\s+exists\s+)?`?([\w.]+)`?\s*;?\s*$",
        query,
        re.I,
    )
    if not m:
        raise ValueError(f"SQL DROP: cannot parse {query!r}")
    rel = _rel_for_name(wh, tables, m.group(2))
    if not wh.exists(rel):
        if m.group(1):
            return _stats(wh, "drop_table", rel, 0)
        raise ValueError(f"SQL DROP: {rel.table_id} does not exist")
    wh.drop(rel)
    # a dropped materialized view sheds its definition AND the
    # watermark snapshots it pinned on its sources
    _shed_mview(wh, rel)
    return _stats(wh, "drop_table", rel, 1)


_MVIEW_DIR = "_edna_mviews"


def _mview_def_path(wh, rel) -> str:
    # OUTSIDE the view's table dir (whole-dir rewrites on a full
    # rebuild would delete an in-dir sidecar), `_`-prefixed so the
    # default table registration's listing ignores it
    return os.path.join(wh.root, rel.schema, _MVIEW_DIR, rel.identifier + ".json")


def _shed_mview(wh, rel) -> None:
    """Retire a materialized-view definition AND the watermark snapshots
    it pinned on its sources. Called whenever the name stops being this
    view — DROP TABLE, CREATE [OR REPLACE] TABLE over the name, or
    CREATE OR REPLACE MATERIALIZED VIEW with (possibly different)
    sources. Two hazards this closes (ADVICE r10 #1/#2): a stale
    definition left behind a plain CREATE TABLE would let a later
    REFRESH run the IVM delta path against user data (silent corruption
    when columns align), and the sources' promoted ``joinview:<t>:l/r``
    / ``aggview:<t>`` snapshots would otherwise stay pinned forever,
    retaining deleted rows (hardlinked versions) against purge_keys'
    right-to-be-forgotten contract. No-op when no definition exists."""
    path = _mview_def_path(wh, rel)
    try:
        with open(path) as f:
            defn = json.load(f)
    except (OSError, ValueError):
        return
    tid = rel.table_id

    def _owned(note: str, owner_tid: str) -> bool:
        # exact note (or its '!pending' variant) — never a bare prefix
        # match, which would also shed a SIBLING view whose table id
        # merely extends this one (s.v vs s.v2 on a shared source)
        base = note.split("!", 1)[0]
        return base in (
            f"joinview:{owner_tid}:l",
            f"joinview:{owner_tid}:r",
            f"aggview:{owner_tid}",
            f"extview:{owner_tid}",
        )

    srcs = []
    if "left" in defn:
        srcs += [defn["left"], defn["right"]]
    if "source" in defn:
        srcs.append(defn["source"])
    if defn.get("kind") == "distinct":
        # two-level view: the SOURCE's watermark is pinned under the
        # CHILD's name, and the child table (with its own snapshots,
        # including the level-2 watermark) retires with the view
        child_rel = wh.relation(*defn["child"])
        src_rel = wh.relation(*defn["source"])
        child_tid = child_rel.table_id
        try:
            for sn in wh.list_snapshots(src_rel):
                if _owned(sn.get("note") or "", child_tid):
                    wh.drop_snapshot(src_rel, sn["version"])
        except OSError:
            pass
        if wh.exists(child_rel):
            wh.drop(child_rel)
    if defn.get("kind") == "join_agg":
        # multi-level join-aggregate: the base tables (and each chain
        # child) carry join-view watermarks under the NEXT child's
        # name; every hidden child — the __join* chain plus the
        # level-2 children (__elems / __agg / __dcnt / __dcnt__elems)
        # — retires with the view, taking its own snapshots (level
        # watermarks + serve watermarks) along
        chain = [
            wh.relation(*c)
            for c in (defn.get("children") or [defn["child"]])
        ]
        chain_tids = {c.table_id for c in chain}
        ext_srcs = [defn["left"], defn["right"]] + [
            d["rel"] for d in defn.get("dims") or []
        ]
        for s in ext_srcs:
            src_rel = wh.relation(*s)
            try:
                for sn in wh.list_snapshots(src_rel):
                    note = sn.get("note") or ""
                    if any(_owned(note, t) for t in chain_tids):
                        wh.drop_snapshot(src_rel, sn["version"])
            except OSError:
                continue
        for c in chain + [
            wh.relation(*c) for c in defn.get("l2_children") or []
        ]:
            if wh.exists(c):
                wh.drop(c)
    if defn.get("kind") == "agg_having":
        # two-level: the SOURCE carries the level-1 watermark under the
        # CHILD's name; the child (with the havview serve watermark
        # among its snapshots) retires with the view
        child_rel = wh.relation(*defn["child"])
        src_rel = wh.relation(*defn["source"])
        child_tid = child_rel.table_id
        try:
            for sn in wh.list_snapshots(src_rel):
                if _owned(sn.get("note") or "", child_tid):
                    wh.drop_snapshot(src_rel, sn["version"])
        except OSError:
            pass
        if wh.exists(child_rel):
            wh.drop(child_rel)
    if defn.get("kind") == "agg_distinct":
        # mixed form: the SOURCE carries watermarks under BOTH children
        # (the agg child's, and the distinct child's __elems level-1);
        # all three child tables retire with the view — their own
        # snapshots (level-2 + serve watermarks) vanish with them
        child_a = wh.relation(*defn["child_agg"])
        child_d = wh.relation(*defn["child_dcnt"])
        elems = wh.relation(child_d.schema, child_d.identifier + "__elems")
        src_rel = wh.relation(*defn["source"])
        try:
            for sn in wh.list_snapshots(src_rel):
                note = sn.get("note") or ""
                if _owned(note, child_a.table_id) or _owned(
                    note, elems.table_id
                ):
                    wh.drop_snapshot(src_rel, sn["version"])
        except OSError:
            pass
        for c in (child_a, child_d, elems):
            if wh.exists(c):
                wh.drop(c)
    for s in srcs:
        src_rel = wh.relation(*s)
        try:
            snaps = wh.list_snapshots(src_rel)
        except OSError:
            continue
        for sn in snaps:
            if _owned(sn.get("note") or "", tid):
                wh.drop_snapshot(src_rel, sn["version"])
    try:
        os.remove(path)
    except OSError:
        pass


def _create_mview(wh, tables, query: str) -> DataFrame:
    """Dispatch between the maintained-view forms: a UNIQUE KEYS clause
    means the sides join (a pair identity is a join concept) — with a
    GROUP BY on top it is the composed join-aggregate form, without one
    the plain join view; everything else parses as the GROUP BY
    aggregate form over one source."""
    if re.search(r"\bunique\s+keys\b", query, re.I):
        if re.search(r"\bgroup\s+by\b", query, re.I):
            return _create_mview_join_agg(wh, tables, query)
        return _create_mview_join(wh, tables, query)
    return _create_mview_agg(wh, tables, query)


def _parse_mv_agg_items(
    select_txt: str, keys: list[str]
) -> tuple[dict, dict, dict, dict]:
    """Parse the aggregate-form SELECT list into (aggs, derived_keys,
    distinct, extrema): sum/count/avg outputs in SELECT order, the
    exact-integer time_bucket derived keys, count(DISTINCT) outputs,
    and min/max (extrema) outputs. Shared by the single-source
    aggregate form and the composed join-aggregate form."""
    aggs: dict[str, tuple[str, str]] = {}  # sum/count/avg, SELECT order
    derived: dict[str, str] = {}
    distinct: dict[str, str] = {}
    extrema: dict[str, tuple[str, str]] = {}

    def _claim(out: str) -> str:
        if out in aggs or out in extrema or out in distinct:
            raise ValueError(
                f"SQL CREATE MATERIALIZED VIEW: output {out!r} aliased twice"
            )
        return out

    for item in _split_top(select_txt, ","):
        item = item.strip()
        cdm = re.match(
            r"^count\s*\(\s*distinct\s+`?(\w+)`?\s*\)\s+as\s+`?(\w+)`?$",
            item,
            re.I,
        )
        if cdm:
            distinct[_claim(cdm.group(2))] = cdm.group(1)
            continue
        am = re.match(
            r"^(sum|count|min|max|avg)\s*\(\s*(\*|`?\w+`?)\s*\)\s+as\s+`?(\w+)`?$",
            item,
            re.I,
        )
        if am:
            fn = am.group(1).lower()
            out = _claim(am.group(3))
            col = am.group(2).strip("`")
            if fn in ("min", "max"):
                extrema[out] = (fn, col)
            else:
                if fn == "avg" and col == "*":
                    raise ValueError(
                        "SQL CREATE MATERIALIZED VIEW: avg(*) is not a "
                        "thing — avg takes a column"
                    )
                aggs[out] = (fn, col)
            continue
        # EXPRESSION measures: sum/avg over an arbitrary row-local
        # expression, with the quantize(expr, d) sugar for float-typed
        # ones — sum(l_extendedprice * (1 - l_discount)) is the measure
        # shape the reference's consuming models compile
        # (incremental_log.sql:66-73); threads into the operator's
        # ("sum"|"avg", None, {"expr": ..., "quantize": ...}) spec
        em = re.match(
            r"^(sum|avg)\s*\((.+)\)\s+as\s+`?(\w+)`?$", item, re.I | re.S
        )
        if em and em.group(2).count("(") == em.group(2).count(")"):
            fn = em.group(1).lower()
            out = _claim(em.group(3))
            inner = em.group(2).strip()
            qm = re.match(
                r"^quantize\s*\((.+)\s*,\s*(\d+)\s*\)$", inner, re.I | re.S
            )
            if qm and qm.group(1).count("(") == qm.group(1).count(")"):
                aggs[out] = (
                    fn,
                    None,
                    {"expr": qm.group(1).strip(), "quantize": int(qm.group(2))},
                )
            else:
                aggs[out] = (fn, None, {"expr": inner})
            continue
        dm = re.match(
            r"^time_bucket\s*\(\s*`?(\w+)`?\s*,\s*(\d+)\s*\)\s+as\s+`?(\w+)`?$",
            item,
            re.I,
        )
        if dm:
            # the continuous-aggregate derived key: the exact-integer
            # time_bucket expression (micros div bucket — never a float
            # quotient); must also be named in GROUP BY
            name = dm.group(3)
            if name not in keys:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: derived key {name!r} "
                    "must appear in GROUP BY"
                )
            derived[name] = (
                f"unix_micros(`{dm.group(1)}`) div {int(dm.group(2))}"
            )
            continue
        bm = re.match(r"^`?(\w+)`?$", item)
        if bm and bm.group(1) in keys:
            continue  # group key riding in the SELECT list
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: cannot parse SELECT item "
            f"{item!r} — the aggregate form takes group keys, "
            "time_bucket(ts, us) AS name, sum(col) / count(*) / "
            "avg(col) AS name, sum|avg(<row-local expr>) AS name "
            "(wrap a float-typed expression in quantize(expr, d)), "
            "count(DISTINCT col) AS name, and min(col) / max(col) AS "
            "name (extrema form) only"
        )
    return aggs, derived, distinct, extrema


def _validate_avg_base(aggs: dict, keys: list[str], schema, df=None) -> None:
    """Pre-shed validation mirroring the operator's spec preprocessing
    (each avg maintains a hidden exact sum next to the count(*);
    quantize/expr 3-part specs derive a measure column) — the SAME
    normalization the operator runs, so a bad spec raises here before
    anything is shed or dropped. ``df`` (when given) lets expression
    measures analyze against the real source frame."""
    from edna_dbt_library_spark.operators.materializations import (
        _normalize_agg_specs,
        _validate_aggs,
    )

    for n in aggs:
        if n in keys:
            raise ValueError(
                f"SQL CREATE MATERIALIZED VIEW: output {n!r} "
                "collides with a group key"
            )
    base_aggs, measure_exprs, _avg, _scale, _hidden = _normalize_agg_specs(
        {n: tuple(v) for n, v in aggs.items()}, keys, {}
    )
    if measure_exprs and df is not None:
        df = df.withColumns({n: F.expr(e) for n, e in measure_exprs.items()})
        schema = df.schema  # expression measures must analyze
    _validate_aggs(base_aggs, schema, keys)


def _create_mview_agg(wh, tables, query: str) -> DataFrame:
    """CREATE [OR REPLACE] MATERIALIZED VIEW <t>
         AS SELECT <k1, ..., sum(col) AS out, count(*) AS out2, ...>
         FROM <src> [WHERE <row-local pred>] GROUP BY <k1, ...>

    -> one full run_incremental_agg_view materialize; REFRESH then
    maintains it off the source's changelog (inserts add, deletes
    subtract, the count(*) column retracts groups to zero; the WHERE
    filters both feeds symmetrically — see the operator's σ contract).
    The operator's exactness contract applies: exactly one count(*),
    sum measures integer/decimal NOT NULL; violations — including a
    predicate that does not analyze — raise before anything is
    created or shed. The view's stored column order is keys first,
    then the aggregate outputs in SELECT order.

    ``min(col) AS out`` / ``max(col) AS out`` outputs dispatch the
    whole view to ``run_incremental_extrema_view`` (kind "extrema" —
    touched-group recompute, the scoped-rescan IVM for non-invertible
    aggregates): all outputs must then be min/max, no count(*)
    required. ``avg(col) AS out`` is a DERIVED output of the agg form:
    the view physically maintains the exact hidden sum (`_<out>__sum`)
    and serves the division off the count(*) column, recomputed for
    every touched group at sync time."""
    m = re.match(
        r"^\s*create\s+(or\s+replace\s+)?materialized\s+view\s+`?([\w.]+)`?\s+"
        r"as\s+select\s+(.*?)\s+from\s+`?([\w.]+)`?"
        r"(?:\s+where\s+(.+?))?\s+"
        r"group\s+by\s+([\w`,\s]+?)"
        r"(?:\s+having\s+(.+?))?\s*;?\s*$",
        query,
        re.I | re.S,
    )
    if not m:
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: cannot parse — supported forms "
            "are the join view (... UNIQUE KEYS (lid, rid) AS SELECT * "
            "FROM l JOIN r USING (k), each side optionally (SELECT cols "
            "FROM t WHERE pred)) and the aggregate view (AS SELECT "
            "k, sum(x) AS sx, count(*) AS n FROM src [WHERE pred] "
            "GROUP BY k); richer "
            f"SELECTs need run_cdc_refresh or the DataFrame API: {query!r}"
        )
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_view,
    )

    rel = _rel_for_name(wh, tables, m.group(2))
    if wh.exists(rel) and not m.group(1):
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: {rel.table_id} exists "
            "(use CREATE OR REPLACE)"
        )
    src = _rel_for_name(wh, tables, m.group(4))
    where = m.group(5).strip() if m.group(5) else None
    keys = [c.strip().strip("`") for c in m.group(6).split(",") if c.strip()]
    having = m.group(7).strip() if m.group(7) else None
    aggs, derived, distinct, extrema = _parse_mv_agg_items(m.group(3), keys)
    if having is not None and (distinct or extrema):
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: HAVING is supported on the "
            "sum/count/avg aggregate form only (the distinct/extrema "
            "kinds serve their state directly; filter at read time or "
            "compose via the DataFrame API)"
        )
    plain_keys = [k for k in keys if k not in derived]
    # validate the spec BEFORE shedding/dropping anything: a bad spec
    # must never destroy the existing view on OR REPLACE — one source
    # probe (metadata-only) serves every check below
    src_df = wh.read(src)
    if distinct:
        if len(distinct) > 1 or extrema:
            raise ValueError(
                "SQL CREATE MATERIALIZED VIEW: at most ONE "
                "count(DISTINCT col) output, and it cannot mix with "
                "min/max (the mixed form composes the agg view with "
                "the distinct view's multiplicity child; extrema want "
                "their own view joined on the keys)"
            )
        ((out, dcol),) = distinct.items()
        schema = src_df.schema
        if dcol not in schema.names:
            raise ValueError(
                f"SQL CREATE MATERIALIZED VIEW: distinct column {dcol!r} "
                "not in source"
            )
        if dcol in keys or out in keys:
            raise ValueError(
                "SQL CREATE MATERIALIZED VIEW: count(DISTINCT) column/"
                "output must not be a group key"
            )
        if aggs:
            # mixed form: the sum/count/avg side validates exactly as
            # its own agg view would (pre-shed)
            _validate_avg_base(aggs, keys, schema, df=src_df)
    elif extrema:
        if aggs:
            raise ValueError(
                "SQL CREATE MATERIALIZED VIEW: min/max outputs make an "
                "EXTREMA view (touched-group recompute) and cannot mix "
                "with sum/count/avg in one view — the sum family is "
                "retractable and belongs in its own agg view; a "
                "consumer wanting both joins the two views on the keys"
            )
        schema = src_df.schema
        for out, (_fn, col) in extrema.items():
            if col not in schema.names:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: min/max column "
                    f"{col!r} not in source"
                )
            if out in keys:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: output {out!r} "
                    "collides with a group key"
                )
    else:
        _validate_avg_base(aggs, keys, src_df.schema, df=src_df)
    probe = src_df
    if derived:
        probe = probe.withColumns({n: F.expr(e) for n, e in derived.items()})
        probe.schema  # derived keys must analyze (ts column exists)
    if where is not None:
        probe.where(where).schema  # predicate must analyze
    if distinct and aggs:
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_agg_distinct_view,
        )

        child_a = wh.relation(rel.schema, rel.identifier + "__agg")
        child_d = wh.relation(rel.schema, rel.identifier + "__dcnt")
        elems = wh.relation(rel.schema, rel.identifier + "__dcnt__elems")
        squatted = [c for c in (child_a, child_d, elems) if wh.exists(c)]
        if squatted:
            # same pre-shed invariant as the distinct form's __elems:
            # the slots are fine only when the PRIOR definition is an
            # agg_distinct view that owns them
            try:
                with open(_mview_def_path(wh, rel)) as f:
                    prior_defn = json.load(f)
            except (OSError, ValueError):
                prior_defn = {}
            owns = (
                prior_defn.get("kind") == "agg_distinct"
                and prior_defn.get("child_agg")
                == [child_a.schema, child_a.identifier]
                and prior_defn.get("child_dcnt")
                == [child_d.schema, child_d.identifier]
            )
            if not owns:
                raise ValueError(
                    "SQL CREATE MATERIALIZED VIEW: "
                    f"{squatted[0].table_id} exists — the mixed "
                    "aggregate+distinct view needs the __agg/__dcnt "
                    "child names"
                )
        _shed_mview(wh, rel)
        if wh.exists(rel):
            wh.drop(rel)
        stats = run_incremental_agg_distinct_view(
            wh, src, rel, plain_keys, aggs, dcol, out=out, where=where,
            derived_keys=derived or None,
        )
        defn = {
            "kind": "agg_distinct",
            "source": [src.schema, src.identifier],
            "child_agg": [child_a.schema, child_a.identifier],
            "child_dcnt": [child_d.schema, child_d.identifier],
            "keys": plain_keys,
            "aggs": {k: list(v) for k, v in aggs.items()},
            "col": dcol,
            "out": out,
            "where": where,
            "derived_keys": derived or None,
        }
        path = _mview_def_path(wh, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(defn, f)
        return _stats(
            wh, "create_materialized_view", rel, stats["n_groups_upserted"]
        )
    if distinct:
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_distinct_view,
        )

        child = wh.relation(rel.schema, rel.identifier + "__elems")
        # collision check BEFORE shedding: OR REPLACE over an existing
        # view must never destroy it and THEN raise on an unrelated
        # table occupying the child name (ADVICE r11) — the child slot
        # is fine only when the PRIOR definition is a distinct view
        # that owns it (shed retires it along with the view)
        if wh.exists(child):
            try:
                with open(_mview_def_path(wh, rel)) as f:
                    prior_defn = json.load(f)
            except (OSError, ValueError):
                prior_defn = {}
            owns = prior_defn.get("kind") == "distinct" and prior_defn.get(
                "child"
            ) == [child.schema, child.identifier]
            if not owns:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: {child.table_id} exists "
                    "— the distinct view needs that name for its element "
                    "child table"
                )
        _shed_mview(wh, rel)
        if wh.exists(rel):
            wh.drop(rel)
        stats = run_incremental_distinct_view(
            wh, src, rel, plain_keys, dcol, out=out, where=where,
            derived_keys=derived or None,
        )
        defn = {
            "kind": "distinct",
            "source": [src.schema, src.identifier],
            "child": [child.schema, child.identifier],
            "keys": plain_keys,
            "col": dcol,
            "out": out,
            "where": where,
            "derived_keys": derived or None,
        }
        path = _mview_def_path(wh, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(defn, f)
        return _stats(
            wh, "create_materialized_view", rel, stats["n_groups_upserted"]
        )
    if extrema:
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_extrema_view,
        )

        _shed_mview(wh, rel)
        if wh.exists(rel):
            wh.drop(rel)
        stats = run_incremental_extrema_view(
            wh, src, rel, plain_keys, extrema, where=where,
            derived_keys=derived or None,
        )
        defn = {
            "kind": "extrema",
            "source": [src.schema, src.identifier],
            "keys": plain_keys,
            "aggs": {k: list(v) for k, v in extrema.items()},
            "where": where,
            "derived_keys": derived or None,
        }
        path = _mview_def_path(wh, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(defn, f)
        return _stats(
            wh, "create_materialized_view", rel, stats["n_groups_upserted"]
        )
    if having is not None:
        from edna_dbt_library_spark.operators.materializations import (
            _agg_exprs,
            _normalize_agg_specs,
            run_incremental_agg_having_view,
        )

        # pre-shed: HAVING must analyze over the OUTPUT row (keys +
        # aggregate outputs, avg included) — built as a direct
        # aggregate over the probe, exactly the stored schema
        base_aggs, m_exprs, avg_specs, avg_scale, _hid = (
            _normalize_agg_specs(
                {n: tuple(v) for n, v in aggs.items()}, keys, derived
            )
        )
        hp = probe
        if m_exprs:
            hp = hp.withColumns({n: F.expr(e) for n, e in m_exprs.items()})
        hframe = hp.groupBy(*keys).agg(*_agg_exprs(base_aggs))
        if avg_specs:
            count_col = next(
                k for k, v in base_aggs.items() if v[0] == "count"
            )
            hframe = hframe.withColumns(
                {
                    n: F.col(f"_{n}__sum").cast("double") / F.col(count_col)
                    for n in avg_specs
                }
            )
        hframe.where(having).schema  # must analyze
        child = wh.relation(rel.schema, rel.identifier + "__state")
        if wh.exists(child):
            try:
                with open(_mview_def_path(wh, rel)) as f:
                    prior_defn = json.load(f)
            except (OSError, ValueError):
                prior_defn = {}
            owns = prior_defn.get("kind") == "agg_having" and prior_defn.get(
                "child"
            ) == [child.schema, child.identifier]
            if not owns:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: {child.table_id} "
                    "exists — the HAVING view needs that name for its "
                    "full-state child table"
                )
        _shed_mview(wh, rel)
        if wh.exists(rel):
            wh.drop(rel)
        stats = run_incremental_agg_having_view(
            wh, src, rel, plain_keys, aggs, having, where=where,
            derived_keys=derived or None,
        )
        defn = {
            "kind": "agg_having",
            "source": [src.schema, src.identifier],
            "child": [child.schema, child.identifier],
            "keys": plain_keys,
            "aggs": {k: list(v) for k, v in aggs.items()},
            "having": having,
            "where": where,
            "derived_keys": derived or None,
        }
        path = _mview_def_path(wh, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(defn, f)
        return _stats(
            wh, "create_materialized_view", rel, stats["n_groups_upserted"]
        )
    _shed_mview(wh, rel)
    if wh.exists(rel):
        wh.drop(rel)
    stats = run_incremental_agg_view(
        wh, src, rel, plain_keys, aggs, where=where,
        derived_keys=derived or None,
    )
    defn = {
        "kind": "agg",
        "source": [src.schema, src.identifier],
        "keys": plain_keys,
        "aggs": {k: list(v) for k, v in aggs.items()},
        "where": where,
        "derived_keys": derived or None,
    }
    path = _mview_def_path(wh, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(defn, f)
    return _stats(
        wh, "create_materialized_view", rel, stats["n_groups_upserted"]
    )


def _mv_side(text: str) -> tuple[str, list[str] | None, str | None, str]:
    """Parse one side of the MV join form from the head of ``text``:
    either a bare table name, or a derived table
    ``(SELECT <cols|*> FROM <name> [WHERE <row-local pred>])``.
    Returns (name, cols|None, where|None, rest-of-text). Column items
    must be bare names (expressions want the DataFrame API)."""
    text = text.lstrip()
    if text.startswith("("):
        depth, q = 0, None
        end = None
        for i, ch in enumerate(text):
            if q is not None:
                if ch == q:
                    q = None
                continue
            if ch in "'\"`":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end is None:
            raise ValueError(
                f"SQL CREATE MATERIALIZED VIEW: unbalanced ( in {text!r}"
            )
        inner, rest = text[1:end], text[end + 1 :]
        sm = re.match(
            r"^\s*select\s+(.*?)\s+from\s+`?([\w.]+)`?"
            r"(?:\s+where\s+(.+?))?\s*$",
            inner,
            re.I | re.S,
        )
        if not sm:
            raise ValueError(
                "SQL CREATE MATERIALIZED VIEW: a derived-table side must "
                "be (SELECT cols FROM t [WHERE pred]); got "
                f"({inner.strip()!r})"
            )
        cols_txt = sm.group(1).strip()
        if cols_txt == "*":
            cols = None
        else:
            cols = [c.strip().strip("`") for c in _split_top(cols_txt, ",")]
            bad = [c for c in cols if not re.fullmatch(r"\w+", c)]
            if bad:
                raise ValueError(
                    "SQL CREATE MATERIALIZED VIEW: side projections take "
                    f"bare column names only, got {bad!r} — computed "
                    "columns want the DataFrame API"
                )
        where = sm.group(3).strip() if sm.group(3) else None
        return sm.group(2), cols, where, rest
    nm = re.match(r"^`?([\w.]+)`?", text)
    if not nm:
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: cannot parse side at {text!r}"
        )
    return nm.group(1), None, None, text[nm.end() :]


def _create_mview_join(wh, tables, query: str) -> DataFrame:
    """CREATE [OR REPLACE] MATERIALIZED VIEW <t>
         UNIQUE KEYS (<left_id>, <right_id>)
         AS SELECT * FROM <l> [INNER|LEFT [OUTER]] JOIN <r>
            USING (c1[, ...])

    ``LEFT JOIN`` dispatches to :func:`run_incremental_left_join_view`
    (kind "left_join"): unmatched left rows ride null-extended, a
    late-arriving dimension match retracts the null-extension, the
    last match dying re-lands it — same watermark protocol and side
    σ(π(·)) contract as the inner form.

    where each side <l>/<r> is a table name or a row-local derived
    table ``(SELECT cols FROM t [WHERE pred])`` — the projection and
    filter thread into run_incremental_join_view's σ(π(L)) ⋈ σ(π(R))
    contract (projections must keep the side's UNIQUE KEY and the
    USING columns; predicates filter the current side AND the insert
    feed while touched ids come from the unfiltered feed).

    -> one full run_incremental_join_view materialize; the definition
    persists in a per-schema `_edna_mviews/` registry so REFRESH can
    re-derive the delta sync. UNIQUE KEYS names each side's row
    identity (the merge unique-key contract) — SQL MVs elsewhere infer
    this from constraints the parquet warehouse doesn't have, so the
    grammar states it. The outer SELECT stays ``*`` (the view's
    columns are the sides'); richer forms raise with a pointer to
    run_cdc_refresh / the DataFrame API."""
    m = re.match(
        r"^\s*create\s+(or\s+replace\s+)?materialized\s+view\s+`?([\w.]+)`?\s+"
        r"unique\s+keys\s*\(\s*`?(\w+)`?\s*,\s*`?(\w+)`?\s*\)\s+"
        r"as\s+select\s+\*\s+from\s+(.*)$",
        query,
        re.I | re.S,
    )
    if not m:
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: cannot parse — supported form is "
            "CREATE [OR REPLACE] MATERIALIZED VIEW t UNIQUE KEYS (lid, rid) "
            "AS SELECT * FROM l JOIN r USING (k), each side optionally "
            "(SELECT cols FROM t WHERE pred); richer SELECTs need "
            f"run_cdc_refresh or the DataFrame API: {query!r}"
        )
    from edna_dbt_library_spark.operators.materializations import (
        _side_view,
        run_incremental_join_view,
    )

    rel = _rel_for_name(wh, tables, m.group(2))
    if wh.exists(rel) and not m.group(1):
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: {rel.table_id} exists "
            "(use CREATE OR REPLACE)"
        )
    rest = m.group(5)
    l_name, l_cols, l_where, rest = _mv_side(rest)
    jm = re.match(
        r"\s*(?:(left)\s+(?:outer\s+)?|inner\s+)?join\s+", rest, re.I
    )
    if not jm:
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: expected JOIN at {rest!r}"
        )
    is_left = jm.group(1) is not None
    r_name, r_cols, r_where, rest = _mv_side(rest[jm.end() :])
    um = re.match(r"\s*using\s*\(\s*([\w`,\s]+?)\s*\)\s*;?\s*$", rest, re.I | re.S)
    if not um:
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: expected USING (keys) at {rest!r}"
        )
    left = _rel_for_name(wh, tables, l_name)
    right = _rel_for_name(wh, tables, r_name)
    on = [c.strip().strip("`") for c in um.group(1).split(",") if c.strip()]
    # validate BEFORE shedding/dropping: projections must keep id+keys
    # and predicates must analyze — a bad spec must never destroy the
    # existing view on OR REPLACE
    _side_view(wh.read(left), l_where, l_cols, "left", m.group(3), on).schema
    _side_view(wh.read(right), r_where, r_cols, "right", m.group(4), on).schema
    # OR REPLACE (or a stale defn with no table): the PREVIOUS
    # definition's source watermarks must not stay pinned — the new
    # view may join different sources
    _shed_mview(wh, rel)
    if wh.exists(rel):
        wh.drop(rel)  # OR REPLACE: the op re-baselines a missing target
    if is_left:
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_left_join_view,
        )

        op = run_incremental_left_join_view
    else:
        op = run_incremental_join_view
    stats = op(
        wh, left, right, rel, m.group(3), m.group(4), on,
        left_where=l_where, right_where=r_where,
        left_cols=l_cols, right_cols=r_cols,
    )
    defn = {
        "kind": "left_join" if is_left else "join",
        "left": [left.schema, left.identifier],
        "right": [right.schema, right.identifier],
        "left_id": m.group(3),
        "right_id": m.group(4),
        "on": on,
        "left_where": l_where,
        "right_where": r_where,
        "left_cols": l_cols,
        "right_cols": r_cols,
    }
    path = _mview_def_path(wh, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(defn, f)
    return _stats(
        wh,
        "create_materialized_view",
        rel,
        stats["n_rows_upserted" if is_left else "n_pairs_inserted"],
    )


def _create_mview_join_agg(wh, tables, query: str) -> DataFrame:
    """CREATE [OR REPLACE] MATERIALIZED VIEW <t>
         UNIQUE KEYS (<id1>, <id2>[, <id3>, ...])
         AS SELECT <k..., aggregates>
         FROM <t1> [INNER] JOIN <t2> USING (c1[, ...])
              [JOIN <t3> USING (c2[, ...]) ...]
         [WHERE <row-local pred>] GROUP BY <k1, ...>

    The composed join-aggregate view — the shape real warehouses
    materialize most (a fact joined to its dimensions, then grouped)
    as ONE maintained view: run_incremental_join_agg_view nests one
    hidden join child per JOIN step (``<t>__join``, ``<t>__join2``,
    ...; each synced off the previous level's changelog with a
    COMPOSITE row identity) under the level-2 view picked by the
    SELECT list:

    * sum/count/avg (incl. expression measures) → the retractable
      aggregate view;
    * one count(DISTINCT col), alone → the exact distinct view;
    * count(DISTINCT col) next to sum/count/avg → the mixed
      agg_distinct rollup (incremental serve);
    * min/max only → the extrema view (touched-group recompute over
      the CHILD, never the bases).

    Sides take the join form's derived-table projections/predicates;
    WHERE between the last USING and GROUP BY is the aggregate's
    row-local σ over the joined row. UNIQUE KEYS names each table's
    row identity in FROM order (the merge unique-key contract)."""
    m = re.match(
        r"^\s*create\s+(or\s+replace\s+)?materialized\s+view\s+`?([\w.]+)`?\s+"
        r"unique\s+keys\s*\(\s*([\w`,\s]+?)\s*\)\s+"
        r"as\s+select\s+(.*?)\s+from\s+(.*)$",
        query,
        re.I | re.S,
    )
    if not m:
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: cannot parse — the "
            "join-aggregate form is CREATE [OR REPLACE] MATERIALIZED "
            "VIEW t UNIQUE KEYS (id1, id2[, ...]) AS SELECT k, sum(x) "
            "AS sx, count(*) AS n FROM a JOIN b USING (c) [JOIN c "
            f"USING (d) ...] [WHERE pred] GROUP BY k: {query!r}"
        )
    from edna_dbt_library_spark.operators.materializations import (
        _side_view,
        run_incremental_join_agg_view,
    )

    rel = _rel_for_name(wh, tables, m.group(2))
    if wh.exists(rel) and not m.group(1):
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: {rel.table_id} exists "
            "(use CREATE OR REPLACE)"
        )
    uids = [c.strip().strip("`") for c in m.group(3).split(",") if c.strip()]
    rest = m.group(5)
    l_name, l_cols, l_where, rest = _mv_side(rest)
    joins = []  # (name, cols, where, on) per joined table, FROM order
    while True:
        jm = re.match(r"\s*(?:inner\s+)?join\s+", rest, re.I)
        if not jm:
            break
        s_name, s_cols, s_where, rest = _mv_side(rest[jm.end() :])
        um = re.match(
            r"\s*using\s*\(\s*([\w`,\s]+?)\s*\)", rest, re.I | re.S
        )
        if not um:
            raise ValueError(
                f"SQL CREATE MATERIALIZED VIEW: expected USING (keys) "
                f"at {rest!r}"
            )
        on_i = [
            c.strip().strip("`") for c in um.group(1).split(",") if c.strip()
        ]
        rest = rest[um.end() :]
        joins.append((s_name, s_cols, s_where, on_i))
    if not joins:
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: expected JOIN at {rest!r}"
        )
    if len(uids) != len(joins) + 1:
        raise ValueError(
            f"SQL CREATE MATERIALIZED VIEW: UNIQUE KEYS names {len(uids)} "
            f"identities for {len(joins) + 1} joined tables — one per "
            "table, in FROM order"
        )
    tm = re.match(
        r"\s*(?:where\s+(.+?)\s+)?group\s+by\s+([\w`,\s]+?)\s*;?\s*$",
        rest,
        re.I | re.S,
    )
    if not tm:
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: expected [WHERE pred] "
            f"GROUP BY keys at {rest!r}"
        )
    left = _rel_for_name(wh, tables, l_name)
    right = _rel_for_name(wh, tables, joins[0][0])
    on = joins[0][3]
    r_cols, r_where = joins[0][1], joins[0][2]
    dim_rels = [_rel_for_name(wh, tables, j[0]) for j in joins[1:]]
    where = tm.group(1).strip() if tm.group(1) else None
    keys = [c.strip().strip("`") for c in tm.group(2).split(",") if c.strip()]
    aggs, derived, distinct, extrema = _parse_mv_agg_items(m.group(4), keys)
    if extrema and (aggs or distinct):
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: min/max outputs make an "
            "EXTREMA view over the joined child and cannot mix with "
            "sum/count/avg or count(DISTINCT) in one view"
        )
    if len(distinct) > 1:
        raise ValueError(
            "SQL CREATE MATERIALIZED VIEW: at most ONE "
            "count(DISTINCT col) output"
        )
    dcol, dout = (None, "n_distinct")
    if distinct:
        ((dout, dcol),) = distinct.items()
    plain_keys = [k for k in keys if k not in derived]
    # validate BEFORE shedding/dropping: sides must keep id+keys, the
    # aggregate spec must be maintainable over the JOINED schema, and
    # derived keys / predicate must analyze on the joined row
    probe = _side_view(wh.read(left), l_where, l_cols, "left", uids[0], on)
    for i, (s_name, s_cols, s_where, on_i) in enumerate(joins):
        side = _side_view(
            _rel_and_read(wh, tables, s_name), s_where, s_cols,
            "right", uids[i + 1], on_i,
        )
        probe = probe.join(side, on=on_i, how="inner")
    if extrema:
        for out_n, (_fn, col) in extrema.items():
            if col not in probe.columns:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: min/max column "
                    f"{col!r} not in the joined row"
                )
            if out_n in keys:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: output {out_n!r} "
                    "collides with a group key"
                )
    else:
        if aggs:
            _validate_avg_base(aggs, keys, probe.schema, df=probe)
        if dcol is not None:
            if dcol not in probe.columns:
                raise ValueError(
                    f"SQL CREATE MATERIALIZED VIEW: distinct column "
                    f"{dcol!r} not in the joined row"
                )
            if dcol in keys or dout in keys or dout in aggs:
                raise ValueError(
                    "SQL CREATE MATERIALIZED VIEW: count(DISTINCT) "
                    "column/output must not be a group key or an "
                    "aggregate output"
                )
    if derived:
        probe = probe.withColumns({n: F.expr(e) for n, e in derived.items()})
        probe.schema  # derived keys must analyze on the joined row
    if where is not None:
        probe.where(where).schema  # predicate must analyze
    # the hidden child slots this view will claim
    chain = [wh.relation(rel.schema, rel.identifier + "__join")] + [
        wh.relation(rel.schema, f"{rel.identifier}__join{i}")
        for i in range(2, len(joins) + 1)
    ]
    if extrema:
        l2 = "extrema"
        l2_children = []
    elif dcol is not None and aggs:
        l2 = "agg_distinct"
        l2_children = [
            wh.relation(rel.schema, rel.identifier + s)
            for s in ("__agg", "__dcnt", "__dcnt__elems")
        ]
    elif dcol is not None:
        l2 = "distinct"
        l2_children = [wh.relation(rel.schema, rel.identifier + "__elems")]
    else:
        l2 = "agg"
        l2_children = []
    # child-name collision check BEFORE shedding (same invariant as the
    # distinct form's __elems): the slots are fine only when the prior
    # definition is a join-agg view that owns them
    squatted = [c for c in chain + l2_children if wh.exists(c)]
    if squatted:
        try:
            with open(_mview_def_path(wh, rel)) as f:
                prior_defn = json.load(f)
        except (OSError, ValueError):
            prior_defn = {}
        prior_children = prior_defn.get("children") or (
            [prior_defn["child"]] if "child" in prior_defn else []
        )
        prior_l2 = prior_defn.get("l2_children") or []
        owned = {tuple(c) for c in prior_children + prior_l2}
        owns = prior_defn.get("kind") == "join_agg" and all(
            (c.schema, c.identifier) in owned for c in squatted
        )
        if not owns:
            raise ValueError(
                f"SQL CREATE MATERIALIZED VIEW: {squatted[0].table_id} "
                "exists — the join-aggregate view needs its __join*/"
                "level-2 child names"
            )
    _shed_mview(wh, rel)
    if wh.exists(rel):
        wh.drop(rel)
    dims = [
        {
            "rel": dim_rels[i],
            "id": uids[i + 2],
            "on": joins[i + 1][3],
            "where": joins[i + 1][2],
            "cols": joins[i + 1][1],
        }
        for i in range(len(dim_rels))
    ]
    stats = run_incremental_join_agg_view(
        wh, left, right, rel, uids[0], uids[1], on, plain_keys,
        extrema if extrema else aggs,
        left_where=l_where, right_where=r_where,
        left_cols=l_cols, right_cols=r_cols,
        where=where, derived_keys=derived or None,
        dims=dims or None,
        distinct_col=dcol, distinct_out=dout,
    )
    defn = {
        "kind": "join_agg",
        "left": [left.schema, left.identifier],
        "right": [right.schema, right.identifier],
        "child": [chain[-1].schema, chain[-1].identifier],
        "children": [[c.schema, c.identifier] for c in chain],
        "l2": l2,
        "l2_children": [[c.schema, c.identifier] for c in l2_children],
        "left_id": uids[0],
        "right_id": uids[1],
        "on": on,
        "left_where": l_where,
        "right_where": r_where,
        "left_cols": l_cols,
        "right_cols": r_cols,
        "dims": [
            {
                "rel": [d["rel"].schema, d["rel"].identifier],
                "id": d["id"],
                "on": d["on"],
                "where": d["where"],
                "cols": d["cols"],
            }
            for d in dims
        ],
        "keys": plain_keys,
        "aggs": {
            k: list(v) for k, v in (extrema if extrema else aggs).items()
        },
        "col": dcol,
        "out": dout,
        "where": where,
        "derived_keys": derived or None,
    }
    path = _mview_def_path(wh, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(defn, f)
    return _stats(
        wh, "create_materialized_view", rel, stats["n_groups_upserted"]
    )


def _rel_and_read(wh, tables, name: str):
    return wh.read(_rel_for_name(wh, tables, name))


def _refresh_mview(wh, tables, query: str) -> DataFrame:
    """REFRESH MATERIALIZED VIEW <t> -> one delta sync off the
    definition's changelog window(s) — both sources for a join view,
    the one source for an aggregate view; n_rows is the window's
    landed pair/group count, 0 for a quiet window."""
    m = re.match(
        r"^\s*refresh\s+materialized\s+view\s+`?([\w.]+)`?\s*;?\s*$",
        query,
        re.I,
    )
    if not m:
        raise ValueError(f"SQL REFRESH: cannot parse {query!r}")
    return _refresh_mview_rel(wh, _rel_for_name(wh, tables, m.group(1)))


def _refresh_mview_rel(wh, rel) -> DataFrame:
    """The REFRESH body on an already-resolved relation — the
    maintenance runner calls this directly with the exact (schema,
    name) pair its plan carried, never re-parsing a reconstructed
    statement string (whose `<schema>__<name>` form is ambiguous when
    the schema itself contains '__' — ADVICE r11)."""
    path = _mview_def_path(wh, rel)
    try:
        with open(path) as f:
            defn = json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"SQL REFRESH: {rel.table_id} is not a materialized view "
            "(no definition in the _edna_mviews registry)"
        ) from None
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_view,
        run_incremental_join_view,
    )

    if defn.get("kind", "join") == "distinct":
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_distinct_view,
        )

        stats = run_incremental_distinct_view(
            wh,
            wh.relation(*defn["source"]),
            rel,
            list(defn["keys"]),
            defn["col"],
            out=defn["out"],
            where=defn.get("where"),
            derived_keys=defn.get("derived_keys"),
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_groups_upserted"]
        )
    if defn.get("kind", "join") == "agg_having":
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_agg_having_view,
        )

        stats = run_incremental_agg_having_view(
            wh,
            wh.relation(*defn["source"]),
            rel,
            list(defn["keys"]),
            {k: tuple(v) for k, v in defn["aggs"].items()},
            defn["having"],
            where=defn.get("where"),
            derived_keys=defn.get("derived_keys"),
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_groups_upserted"]
        )
    if defn.get("kind", "join") == "agg_distinct":
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_agg_distinct_view,
        )

        stats = run_incremental_agg_distinct_view(
            wh,
            wh.relation(*defn["source"]),
            rel,
            list(defn["keys"]),
            {k: tuple(v) for k, v in defn["aggs"].items()},
            defn["col"],
            out=defn["out"],
            where=defn.get("where"),
            derived_keys=defn.get("derived_keys"),
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_groups_upserted"]
        )
    if defn.get("kind", "join") == "join_agg":
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_join_agg_view,
        )

        dims = [
            {
                "rel": wh.relation(*d["rel"]),
                "id": d["id"],
                "on": list(d["on"]),
                "where": d.get("where"),
                "cols": d.get("cols"),
            }
            for d in defn.get("dims") or []
        ]
        stats = run_incremental_join_agg_view(
            wh,
            wh.relation(*defn["left"]),
            wh.relation(*defn["right"]),
            rel,
            defn["left_id"],
            defn["right_id"],
            list(defn["on"]),
            list(defn["keys"]),
            {k: tuple(v) for k, v in defn["aggs"].items()},
            left_where=defn.get("left_where"),
            right_where=defn.get("right_where"),
            left_cols=defn.get("left_cols"),
            right_cols=defn.get("right_cols"),
            where=defn.get("where"),
            derived_keys=defn.get("derived_keys"),
            dims=dims or None,
            distinct_col=defn.get("col"),
            distinct_out=defn.get("out") or "n_distinct",
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_groups_upserted"]
        )
    if defn.get("kind", "join") == "left_join":
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_left_join_view,
        )

        stats = run_incremental_left_join_view(
            wh,
            wh.relation(*defn["left"]),
            wh.relation(*defn["right"]),
            rel,
            defn["left_id"],
            defn["right_id"],
            list(defn["on"]),
            left_where=defn.get("left_where"),
            right_where=defn.get("right_where"),
            left_cols=defn.get("left_cols"),
            right_cols=defn.get("right_cols"),
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_rows_upserted"]
        )
    if defn.get("kind", "join") == "extrema":
        from edna_dbt_library_spark.operators.materializations import (
            run_incremental_extrema_view,
        )

        stats = run_incremental_extrema_view(
            wh,
            wh.relation(*defn["source"]),
            rel,
            list(defn["keys"]),
            {k: tuple(v) for k, v in defn["aggs"].items()},
            where=defn.get("where"),
            derived_keys=defn.get("derived_keys"),
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_groups_upserted"]
        )
    if defn.get("kind", "join") == "agg":
        stats = run_incremental_agg_view(
            wh,
            wh.relation(*defn["source"]),
            rel,
            list(defn["keys"]),
            {k: tuple(v) for k, v in defn["aggs"].items()},
            where=defn.get("where"),
            derived_keys=defn.get("derived_keys"),
        )
        return _stats(
            wh, "refresh_materialized_view", rel, stats["n_groups_upserted"]
        )
    stats = run_incremental_join_view(
        wh,
        wh.relation(*defn["left"]),
        wh.relation(*defn["right"]),
        rel,
        defn["left_id"],
        defn["right_id"],
        list(defn["on"]),
        left_where=defn.get("left_where"),
        right_where=defn.get("right_where"),
        left_cols=defn.get("left_cols"),
        right_cols=defn.get("right_cols"),
    )
    return _stats(wh, "refresh_materialized_view", rel, stats["n_pairs_inserted"])


def dispatch(
    wh: "Warehouse", tables: dict[str, "Relation"], query: str
) -> DataFrame:
    """Execute one DML/DDL statement (caller has already matched
    DML_HEAD_RE) and return its one-row stats frame."""
    head = next(
        g for g in DML_HEAD_RE.match(query).groups() if g is not None
    ).lower()
    return {
        "delete": _delete,
        "update": _update,
        "insert": _insert,
        "merge": _merge,
        "create": _create,
        "drop": _drop,
        "refresh": _refresh_mview,
    }[head](wh, tables, query)
