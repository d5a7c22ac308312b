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

    The salt is xxhash64 over the full row, not rand(): a random salt
    re-draws when a fetch failure re-runs map tasks, routing the re-run
    rows to different (key, salt) reducers than the surviving shuffle
    output — double- or under-counted partials (SPARK-38388; guide
    §2.5). The row hash is retry-stable with the same uniformity.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"salted_aggregate: unsupported aggregate '{fn}' for '{name}'")

    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
        .cast("int")
        .alias("__salt")
    )
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
    scale (SPARK-38388; guide §2.5). xxhash64 over the full row is
    retry-stable and spreads a hot key by its payload columns; rows
    identical in EVERY column share a bucket, which is the one shape
    salting cannot split anyway (they are interchangeable).

    AQE's skew-join splitting (enabled in session.py) handles moderate
    skew automatically at runtime; explicit salting is the deterministic
    plan-level guarantee for pathological keys, and composes with
    bucketed/pre-partitioned layouts where AQE cannot re-split.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}")
    ks = list(keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast(
        "int"
    )
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, ks + ["__salt"], how).drop("__salt")
