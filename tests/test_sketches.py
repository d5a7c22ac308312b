"""Mergeable sketches: HyperLogLog distinct-count, Count-Min frequency."""

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    cms_build,
    cms_lookup,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from edna_dbt_library_spark.sources import load_table


def _lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_hll_estimate_within_error_bound(spark, sf_dir):
    li = _lineitem(spark, sf_dir)
    est = {r["l_returnflag"]: r["distinct_est"] for r in hll_distinct(li, "l_orderkey", ["l_returnflag"]).collect()}
    exact = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag").agg(F.count_distinct("l_orderkey").alias("d")).collect()
    }
    assert set(est) == set(exact)
    for flag, d in exact.items():
        # raw HLL (no small-range correction): ~1.04/sqrt(256) = 6.5% sigma;
        # allow 4 sigma at the fixture cardinalities (~1.1k at sf0.001)
        assert abs(est[flag] - d) / d < 0.26, (flag, est[flag], d)


def test_hll_registers_merge_to_global(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn("m", F.month("l_shipdate"))
    fine = hll_registers(li, "l_orderkey", ["l_returnflag", "m"])
    merged = hll_merge(fine, ["l_returnflag"])
    direct = hll_registers(li, "l_orderkey", ["l_returnflag"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    # and therefore identical estimates, bit for bit
    a = sorted(map(tuple, hll_estimate(merged, ["l_returnflag"]).collect()))
    b = sorted(map(tuple, hll_estimate(direct, ["l_returnflag"]).collect()))
    assert a == b


def test_hll_deterministic_under_repartitioning(spark, sf_dir):
    li = _lineitem(spark, sf_dir)
    a = sorted(map(tuple, hll_distinct(li, "l_orderkey", ["l_returnflag"]).collect()))
    b = sorted(map(tuple, hll_distinct(li.repartition(13), "l_orderkey", ["l_returnflag"]).collect()))
    assert a == b


def test_hll_register_table_is_bounded(spark, sf_dir):
    reg = hll_registers(_lineitem(spark, sf_dir), "l_orderkey", ["l_returnflag"])
    per_group = reg.groupBy("l_returnflag").count().collect()
    assert all(r["count"] <= HLL_M for r in per_group)
    rng = reg.agg(F.min("hll_rho"), F.max("hll_rho"), F.min("hll_idx"), F.max("hll_idx")).first()
    assert rng[0] >= 1 and rng[1] <= 53 and rng[2] >= 0 and rng[3] <= HLL_M - 1


def test_cms_never_underestimates_and_grid_is_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    counters = cms_build(ev, "user_id")
    assert counters.count() <= CMS_DEPTH * CMS_WIDTH
    keys = ev.where(F.col("user_id").isNotNull()).select("user_id").distinct()
    est = cms_lookup(counters, keys, "user_id")
    exact = ev.groupBy("user_id").count()
    under = est.join(exact, "user_id").where(F.col("est_count") < F.col("count")).count()
    assert under == 0


def test_cms_absent_key_estimates_zero_or_collision(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    counters = cms_build(ev, "user_id")
    ghosts = spark.range(10_000_000, 10_000_050).select(F.col("id").alias("user_id"))
    est = cms_lookup(counters, ghosts, "user_id")
    total = ev.where(F.col("user_id").isNotNull()).count()
    # absent keys may collide but the min over 4 rows stays far below the mass
    assert est.agg(F.max("est_count")).first()[0] <= total * 0.05


def test_cms_counters_merge_by_cellwise_sum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    even = cms_build(ev.where(F.col("event_id") % 2 == 0), "user_id")
    odd = cms_build(ev.where(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        even.unionByName(odd)
        .groupBy("cms_row", "cms_col")
        .agg(F.sum("cms_count").alias("cms_count"))
    )
    direct = cms_build(ev, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_stream_hll_matches_batch_exactly(spark, sf_dir, tmp_path):
    """Micro-batched register merging == one-shot batch sketch, bit for
    bit — the mergeability property, exercised through the streaming
    path (two availableNow drains over a growing file source)."""
    from edna_dbt_library_spark.streaming import read_hll_estimates, stream_hll_distinct

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))

    ev.where(F.col("event_id") % 2 == 0).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    stream_hll_distinct(stream, "user_id", ["event_type"], store, ckpt).awaitTermination(120)

    ev.where(F.col("event_id") % 2 == 1).write.parquet(src, mode="append")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    stream_hll_distinct(stream, "user_id", ["event_type"], store, ckpt).awaitTermination(120)

    streamed = sorted(map(tuple, read_hll_estimates(spark, store, ["event_type"]).collect()))
    batch = sorted(map(tuple, hll_distinct(ev, "user_id", ["event_type"]).collect()))
    assert streamed == batch


def test_histogram_quantiles_within_bin_resolution(spark, sf_dir):
    from edna_dbt_library_spark.operators.sketches import HIST_BINS, histogram_quantiles

    li = _lineitem(spark, sf_dir)
    qs = [0.25, 0.5, 0.75, 0.95]
    est = {
        (r["l_linestatus"], r["q"]): r["est"]
        for r in histogram_quantiles(li, "l_extendedprice", qs, ["l_linestatus"]).collect()
    }
    stats = {
        r["l_linestatus"]: r
        for r in li.groupBy("l_linestatus")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").alias("p"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for status, r in stats.items():
        width = (r["hi"] - r["lo"]) / HIST_BINS
        for q, exact in zip(qs, r["p"]):
            assert abs(est[(status, q)] - exact) <= 2 * width, (status, q, est[(status, q)], exact)


def test_histogram_quantiles_deterministic_and_monotone(spark, sf_dir):
    from edna_dbt_library_spark.operators.sketches import histogram_quantiles

    li = _lineitem(spark, sf_dir)
    qs = [0.1, 0.5, 0.9]
    a = sorted(map(tuple, histogram_quantiles(li, "l_extendedprice", qs, ["l_linestatus"]).collect()))
    b = sorted(
        map(tuple, histogram_quantiles(li.repartition(11), "l_extendedprice", qs, ["l_linestatus"]).collect())
    )
    assert a == b
    by_group = {}
    for g, q, e in a:
        by_group.setdefault(g, []).append((q, e))
    for ests in by_group.values():
        vals = [e for _, e in sorted(ests)]
        assert vals == sorted(vals)  # estimates monotone in q


def test_histogram_quantiles_constant_column(spark):
    from edna_dbt_library_spark.operators.sketches import histogram_quantiles

    df = spark.range(100).select(F.lit("g").alias("g"), F.lit(7.5).alias("v"))
    rows = histogram_quantiles(df, "v", [0.5], ["g"]).collect()
    assert len(rows) == 1 and rows[0]["est"] == 7.5


def test_bloom_no_false_negatives_and_fp_removed(spark):
    from edna_dbt_library_spark.operators.sketches import bloom_semi_join

    probe = spark.range(20000).select(F.col("id").alias("k"))
    build = spark.range(0, 20000, 7).select(F.col("id").alias("b"))  # every 7th key
    got = sorted(r["k"] for r in bloom_semi_join(probe, build, "k", "b").collect())
    want = sorted(range(0, 20000, 7))
    assert got == want  # exactly the semi-join: no FNs, FPs removed


def test_bloom_filter_prunes_most_non_members(spark):
    from edna_dbt_library_spark.operators.sketches import bloom_build, bloom_filter_rows

    probe = spark.range(20000).select(F.col("id").alias("k"))
    build = spark.range(500).select(F.col("id").alias("k"))
    bf = bloom_build(build, "k")
    n_cand = bloom_filter_rows(probe, "k", bf).count()
    # all 500 members + a tiny FP tail (expected FP rate ~(k*n/m)^k ≈ 1e-7)
    assert 500 <= n_cand <= 520


def test_bloom_empty_build_rejects_everything(spark):
    from edna_dbt_library_spark.operators.sketches import bloom_build, bloom_filter_rows

    probe = spark.range(1000).select(F.col("id").alias("k"))
    bf = bloom_build(probe.where(F.lit(False)), "k")
    assert bloom_filter_rows(probe, "k", bf).count() == 0


def test_bloom_merge_by_elementwise_or(spark):
    from edna_dbt_library_spark.operators.sketches import bloom_build, bloom_filter_rows

    a = spark.range(0, 300).select(F.col("id").alias("k"))
    b = spark.range(300, 600).select(F.col("id").alias("k"))
    # element-wise OR across the two filters == filter of the union
    merged = (
        bloom_build(a, "k").withColumnRenamed("bf", "bfa")
        .crossJoin(bloom_build(b, "k"))
        .select(F.zip_with("bfa", "bf", lambda x, y: x.bitwiseOR(y)).alias("bf"))
    )
    whole = bloom_build(a.unionAll(b), "k")
    assert merged.collect() == whole.collect()
    probe = spark.range(1000).select(F.col("id").alias("k"))
    got = {r["k"] for r in bloom_filter_rows(probe, "k", merged).collect()}
    assert set(range(600)) <= got


def test_stream_cms_matches_batch_exactly(spark, sf_dir, tmp_path):
    """Per-batch grid subdirs summed at read == one-shot batch grid —
    sum-mergeability through the streaming path, with the batch-id
    subdir write making redelivery idempotent."""
    from edna_dbt_library_spark.operators.sketches import cms_build, cms_lookup
    from edna_dbt_library_spark.streaming.sketch_stream import read_cms_counters, stream_cms_counts

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))

    ev.where(F.col("event_id") % 2 == 0).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    stream_cms_counts(stream, "user_id", store, ckpt).awaitTermination(120)

    ev.where(F.col("event_id") % 2 == 1).write.parquet(src, mode="append")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    stream_cms_counts(stream, "user_id", store, ckpt).awaitTermination(120)

    merged = read_cms_counters(spark, store)
    whole = cms_build(ev, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    # estimates served from the streamed store equal batch estimates
    keys = ev.select("user_id").distinct().limit(20)
    a = sorted(map(tuple, cms_lookup(merged, keys, "user_id").collect()))
    b = sorted(map(tuple, cms_lookup(whole, keys, "user_id").collect()))
    assert a == b


# --- Misra-Gries frequent items --------------------------------------------


def _exact_frequent(df, key, den):
    keyed = df.select(F.col(key).cast("string").alias("k")).where(F.col("k").isNotNull())
    n = keyed.count()
    min_count = max(1, n // den)
    return {
        (r["k"], r["cnt"])
        for r in keyed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .collect()
    }


def _zipfish(spark, n_rows=20_000, n_heavy=12):
    """Adversarial shape: a few heavy keys interleaved with a long tail of
    singletons (tail >> capacity so the sketch MUST decrement)."""
    heavy = spark.range(n_rows // 2).select(
        F.concat(F.lit("h"), (F.col("id") % n_heavy).cast("string")).alias("k")
    )
    tail = spark.range(n_rows // 2).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("k")
    )
    return heavy.unionAll(tail)


def test_frequent_items_equals_exact_group_by(spark):
    from edna_dbt_library_spark.operators.sketches import frequent_items

    df = _zipfish(spark)
    # capacity 512 << 10_012 distinct keys: decrements fire in every partition
    got = {
        (r["k"], r["cnt"])
        for r in frequent_items(df, "k", den=256, capacity=512).collect()
    }
    assert got == _exact_frequent(df, "k", 256)
    assert len(got) == 12  # exactly the heavy keys


def test_frequent_items_partitioning_independent(spark):
    from edna_dbt_library_spark.operators.sketches import frequent_items

    df = _zipfish(spark, n_rows=8_000)
    one = {
        (r["k"], r["cnt"])
        for r in frequent_items(df.coalesce(1), "k", den=128, capacity=256).collect()
    }
    many = {
        (r["k"], r["cnt"])
        for r in frequent_items(df.repartition(13), "k", den=128, capacity=256).collect()
    }
    assert one == many == _exact_frequent(df, "k", 128)


def test_frequent_items_null_keys_ignored_and_bounds(spark):
    from edna_dbt_library_spark.operators.sketches import frequent_items

    import pytest as _pytest

    df = _zipfish(spark, n_rows=4_000).unionAll(
        spark.range(500).select(F.lit(None).cast("string").alias("k"))
    )
    got = {
        (r["k"], r["cnt"])
        for r in frequent_items(df, "k", den=64, capacity=128).collect()
    }
    assert got == _exact_frequent(df, "k", 64)
    assert all(k is not None for k, _ in got)
    with _pytest.raises(ValueError):
        frequent_items(df, "k", den=100, capacity=150)  # 2*den > capacity


def test_stream_frequent_items_matches_batch_exactly(spark, tmp_path):
    """Streamed MG summaries (batch-id subdir store) + the exact-count
    read == one-shot batch frequent_items, row for row — the summaries'
    sum-mergeability composed across micro-batches AND partitions, with
    the capacity small enough that decrements fire in both drains."""
    from edna_dbt_library_spark.operators.sketches import frequent_items
    from edna_dbt_library_spark.streaming import (
        read_frequent_items_exact,
        stream_frequent_items,
    )

    df = _zipfish(spark).withColumn("rid", F.monotonically_increasing_id())
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))

    df.where(F.col("rid") % 2 == 0).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(df.schema).parquet(src)
    stream_frequent_items(stream, "k", store, ckpt, capacity=512).awaitTermination(120)

    df.where(F.col("rid") % 2 == 1).write.parquet(src, mode="append")
    stream = spark.readStream.schema(df.schema).parquet(src)
    stream_frequent_items(stream, "k", store, ckpt, capacity=512).awaitTermination(120)

    streamed = {
        (r["k"], r["cnt"])
        for r in read_frequent_items_exact(
            spark, store, df, "k", den=256, capacity=512
        ).collect()
    }
    batch = {
        (r["k"], r["cnt"])
        for r in frequent_items(df, "k", den=256, capacity=512).collect()
    }
    assert streamed == batch == _exact_frequent(df, "k", 256)

    # ADVICE r8: the per-batch MG decrement pass bounds each stored
    # summary at <= capacity non-null rows (a plain key-sum merge is
    # bounded only by partitions x capacity), sentinel exempt
    import glob as _glob

    subdirs = sorted(_glob.glob(store + "/batch=*"))
    assert subdirs
    for sub in subdirs:
        s = spark.read.parquet(sub)
        assert s.where(F.col("k").isNotNull()).count() <= 512
        assert s.where(F.col("k").isNull()).count() == 1
