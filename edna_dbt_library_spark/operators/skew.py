"""Skew-aware aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (one user generating 1% of all events, a
boilerplate document hash) can pin a single reducer. AQE's skew-join
splitting covers joins; for *aggregations* the classical fix is salting:
shuffle once on (key, salt) computing partial aggregates, then once more on
key to combine — the hot key's work spreads over ``salt_buckets`` reducers.

Only aggregates with a decomposition (sum/count/min/max → themselves;
avg → sum+count) are supported; that covers the reference's entire
aggregate surface (SURVEY.md §2E: COUNT/MIN/MAX/SUM).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _hashable_cols(df: DataFrame) -> list[str]:
    """Columns xxhash64 accepts: MapType (at any nesting depth) is
    unhashable and raises AnalysisException, so drop any column whose
    dtype mentions a map. rand() salted any schema; the deterministic
    retry-stable salt must filter instead."""
    return [c for c, t in df.dtypes if "map<" not in t]


def _salt_col(df: DataFrame, keys: Sequence[str], salt_buckets: int, op: str) -> Column:
    """Deterministic per-row salt over the hashable NON-KEY columns.

    Key columns contribute nothing to spreading a hot key (all of the hot
    key's rows share them — the salt must vary WITHIN a key), so they are
    excluded from the hash. When no hashable non-key column exists the
    salt would be constant per key and salting silently degrades to a
    plain groupBy/join with the hot key still pinned to one reducer —
    raise instead of pretending to help (the plain operator's map-side
    partial aggregation already covers the all-columns-are-keys shape)."""
    key_set = set(keys)
    cols = [c for c in _hashable_cols(df) if c not in key_set]
    if not cols:
        raise ValueError(
            f"{op}: no hashable non-key column to derive a salt from "
            f"(keys={list(keys)}, columns={df.columns}); the salt would be "
            "constant per key, so salting cannot spread a hot key here — "
            "use a plain groupBy/join, or add a varying payload column"
        )
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name -> (fn, column)
    with fn in {sum, count, min, max}.

    ``salted_aggregate(events, ["user_id"], {"n": ("count", "*"),
    "total": ("sum", "value")})`` ≡ the plain groupBy, but the first
    shuffle keys on (user_id, salt) so no reducer sees a whole hot key.

    The salt is xxhash64 over the hashable non-key columns, not rand():
    a random salt re-draws when a fetch failure re-runs map tasks,
    routing the re-run rows to different (key, salt) reducers than the
    surviving shuffle output — double- or under-counted partials
    (SPARK-38388; guide §2.5). The row hash is retry-stable with the
    same uniformity. Map-typed columns are excluded (xxhash64 cannot
    hash them), and a frame with NO hashable non-key column is rejected:
    its salt would be constant per key, silently degrading to the plain
    groupBy this operator exists to beat.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"salted_aggregate: unsupported aggregate '{fn}' for '{name}'")

    salt = _salt_col(df, keys, salt_buckets, "salted_aggregate").alias("__salt")
    partial_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        src = F.lit(1) if (fn == "count" and col == "*") else F.col(col)
        partial = F.count(src) if fn == "count" else getattr(F, fn)(src)
        partial_exprs.append(partial.alias(f"__p_{name}"))
    partial_df = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = [
        _MERGE[fn](F.col(f"__p_{name}")).alias(name) for name, (fn, _col) in aggs.items()
    ]
    return partial_df.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join for when the small side is too large to
    broadcast but the big side's join keys are skewed: the big side gets a
    per-row salt, the small side is replicated once per salt bucket, and
    the join runs on (keys, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of pinning one.

    Exactly equivalent to ``big.join(small, keys, how)`` for ``inner`` and
    ``left``: each big-side row joins the single small-side replica
    carrying its salt, so no duplicates and no misses. (``right``/``full``
    are rejected — the replicated small side would multiply unmatched
    right rows.) The salt never reaches the output, so only its
    uniformity matters — but it must be DETERMINISTIC per row: a rand()
    salt re-draws on task retry, and a fetch failure that re-runs part
    of the map stage then routes the re-run rows to different reducers
    than the surviving shuffle output — duplicated or lost rows at
    scale (SPARK-38388; guide §2.5). xxhash64 over the hashable
    NON-KEY columns is retry-stable and spreads a hot key by its
    payload columns (map-typed columns are skipped — xxhash64 cannot
    hash them; key columns are skipped because a hot key's rows all
    share them, so they cannot vary the salt). Rows identical in every
    payload column share a bucket, which is the one shape salting
    cannot split anyway (they are interchangeable); a big side with NO
    hashable payload column is rejected rather than silently salted
    with a per-key constant.

    AQE's skew-join splitting (enabled in session.py) handles moderate
    skew automatically at runtime; explicit salting is the deterministic
    plan-level guarantee for pathological keys, and composes with
    bucketed/pre-partitioned layouts where AQE cannot re-split.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}")
    ks = list(keys)
    salt = _salt_col(big, ks, salt_buckets, "salted_join")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, ks + ["__salt"], how).drop("__salt")
